package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash32
import graft.operators.SimilaritySearch

/** Measured recall for FILTERED ANN (the qv16 shape): a metadata
  * predicate composed with the IVF probe path. qv16's oracle proves the
  * composition computes exactly what it claims; this spec measures what
  * the composition COSTS in recall as the predicate tightens — the
  * filtered ground truth concentrates in fewer buckets, so a fixed
  * probe budget sees a shrinking share of the eligible corpus. The
  * mitigation is the existing probe knob, not a new algorithm: at
  * probes = C the filtered query IS the filtered brute force, so recall
  * is 1.0 by construction and the curve has a hard ceiling to climb to.
  * Numbers land in SCALE.md §filtered-ANN.
  *
  * The predicate is hash-uniform over vec_id (decorrelated from the
  * embedding clusters), the worst realistic case: a label-correlated
  * predicate would concentrate eligible vectors in FEWER buckets and
  * probe-rank those buckets higher, helping recall. */
class FilteredAnnRecallSpec extends SparkSpec {

  private lazy val emb = graft.queries.Oracle
    .table(spark, "/root/testdata/sf0.001", "embeddings").cache()
  private lazy val cents = SimilaritySearch.kmeansCentroids(emb, 8)
  private lazy val bucketed = SimilaritySearch.ivfAssign(emb, cents).cache()

  /** Keeps ~pct% of vectors, independent of cluster structure. */
  private def keep(pct: Int) =
    pmod(hash32(col("vec_id").cast("string")), lit(100)) < lit(pct)

  /** Mean recall@10 over 5 query vectors; also returns the mean truth
    * size (at tight selectivities the eligible set can be < k). */
  private def meanRecall(pct: Int, probes: Int): (Double, Double) = {
    val rs = (0L until 5L).map { qid =>
      val qvec = emb.filter(col("vec_id") === qid)
        .select(col("embedding")).head.getSeq[Float](0)
      val truth = SimilaritySearch.bruteForceTopK(
        emb.filter(keep(pct)), typedlit(qvec), 10)
      val approx = SimilaritySearch.ivfQuery(
        bucketed.filter(keep(pct)), cents, typedlit(qvec),
        k = 10, probes = probes)
      val r = SimilaritySearch.recallAtK(truth, approx).head()
      (r.getDouble(2), r.getLong(0))
    }
    (rs.map(_._1).sum / rs.size, rs.map(_._2).sum.toDouble / rs.size)
  }

  test("filtered recall@10 vs predicate selectivity (C=8, probes=4)") {
    val bySel = Seq(50, 10, 1).map { pct =>
      val (r, kbar) = meanRecall(pct, probes = 4)
      info(f"selectivity 0.$pct%02d: recall@10 = $r%.3f (mean |truth| = $kbar%.1f)")
      pct -> r
    }.toMap
    // Floors are pinned ~0.05 under the measured curve (seedless,
    // deterministic inputs — reruns reproduce the same numbers).
    // measured: 0.800 / 0.600 / 0.467 (vs 0.9+ unfiltered, IvfRecallSpec)
    assert(bySel(50) >= 0.75, s"sel 0.50 recall ${bySel(50)}")
    assert(bySel(10) >= 0.55, s"sel 0.10 recall ${bySel(10)}")
    assert(bySel(1) >= 0.40, s"sel 0.01 recall ${bySel(1)}")
  }

  test("probe escalation restores filtered recall at selectivity 0.01") {
    val curve = Seq(4, 6, 8).map { p =>
      val (r, _) = meanRecall(1, probes = p)
      info(f"probes=$p: recall@10 = $r%.3f")
      p -> r
    }
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall not monotone in probes: $curve")
    // probes = C probes every bucket: the filtered query degenerates to
    // the filtered brute force, so exact recall is structural
    assert(curve.last._2 == 1.0,
      s"probes=C must be exact, got ${curve.last._2}")
  }

  test("autoProbes encodes the escalation rule: inverse in selectivity, " +
    "floored at base, capped at C, skip-the-index below 1%") {
    import SimilaritySearch.autoProbes
    assert(autoProbes(16, 4, 1.0) == 4)     // unfiltered: base budget
    assert(autoProbes(16, 4, 0.5) == 8)     // half the corpus: 2x base
    assert(autoProbes(16, 4, 0.25) == 16)   // quarter: 4x base = C
    assert(autoProbes(16, 4, 0.1) == 16)    // capped at C
    assert(autoProbes(16, 4, 0.009) == 16)  // sub-1%: skip the index
    assert(autoProbes(8, 4, 0.005) == 8)
    // monotone: tightening the predicate never shrinks the budget
    val sels = Seq(1.0, 0.8, 0.6, 0.5, 0.3, 0.2, 0.1, 0.05, 0.011, 0.009)
    val budgets = sels.map(autoProbes(16, 4, _))
    assert(budgets.sliding(2).forall { case Seq(a, b) => b >= a },
      s"budget not monotone along $sels -> $budgets")
  }

  test("filteredKnnAuto meets the recall floor the measured curve " +
    "promises at each selectivity regime") {
    // sel ~0.5: the rule picks round(4/0.5)=8 of 8 buckets here (C=8)
    // -> filtered brute force, recall 1.0 structural. The INTERESTING
    // autonomy case is the sub-1% regime: the rule must skip the index
    // (probes=C) and recall must be exactly 1.0 rather than the 0.4-ish
    // a fixed probes=4 scores (the measured curve's bottom-left cell).
    (0L until 3L).foreach { qid =>
      val qvec = emb.filter(col("vec_id") === qid)
        .select(col("embedding")).head.getSeq[Float](0)
      val truth = SimilaritySearch.bruteForceTopK(
        emb.filter(keep(1)), typedlit(qvec), 10)
      val auto = SimilaritySearch.filteredKnnAuto(
        bucketed, cents, keep(1), typedlit(qvec), k = 10, baseProbes = 4)
      val r = SimilaritySearch.recallAtK(truth, auto).head().getDouble(2)
      assert(r == 1.0, s"qid=$qid: sub-1% auto recall $r != 1.0")
    }
    // mid-selectivity (50%): budget doubles to 8=C here; floor from the
    // measured curve at this point is 1.0 as well (C=8 corpus) — assert
    // >= the fixed-budget floor to keep the test meaningful if C grows
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    val truth = SimilaritySearch.bruteForceTopK(
      emb.filter(keep(50)), typedlit(qvec), 10)
    val auto = SimilaritySearch.filteredKnnAuto(
      bucketed, cents, keep(50), typedlit(qvec), k = 10, baseProbes = 4)
    val r = SimilaritySearch.recallAtK(truth, auto).head().getDouble(2)
    assert(r >= 0.75, s"sel 0.50 auto recall $r below the curve floor")
  }
}
