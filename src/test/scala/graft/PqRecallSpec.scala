package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Measured PQ quality: ADC top-10 recall against the exact squared-L2
  * ground truth, for the hash-sampled codebook (the oracle-checked
  * variant) and the per-subspace k-means-trained codebook (the
  * production variant). Numbers recorded in SCALE.md. */
class PqRecallSpec extends SparkSpec {

  private lazy val emb =
    graft.queries.Oracle.table(spark, "/root/testdata/sf0.001", "embeddings")

  /** Exact squared-L2 top-10 for the query vector (what ADC
    * approximates), computed with the same sequential double fold. */
  private def l2Truth(q: Array[Float]): org.apache.spark.sql.DataFrame =
    emb.select(col("vec_id"),
      aggregate(
        zip_with(col("embedding"), typedlit(q.toSeq), (x, y) =>
          (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, b) => a + b).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc)
      .limit(10)

  private def recallFor(sample: Seq[Array[Float]], qid: Long): Double = {
    val q = emb.filter(col("vec_id") === qid)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val approx = SimilaritySearch.pqAdcTopK(
      SimilaritySearch.pqEncode(emb, sample), sample, q, k = 10)
    SimilaritySearch.recallAtK(l2Truth(q), approx).head.getDouble(2)
  }

  private def meanRecall(sample: Seq[Array[Float]]): Double = {
    val qids = Seq(0L, 7L, 42L, 99L, 123L)
    qids.map(recallFor(sample, _)).sum / qids.size
  }

  private def rescoreRecall(sample: Seq[Array[Float]], qid: Long,
      shortlist: Int): Double = {
    val q = emb.filter(col("vec_id") === qid)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val approx = SimilaritySearch.pqAdcRescoreTopK(emb, sample, q,
      k = 10, shortlist = shortlist)
    SimilaritySearch.recallAtK(l2Truth(q), approx).head.getDouble(2)
  }

  private def meanRescoreRecall(sample: Seq[Array[Float]],
      shortlist: Int): Double = {
    val qids = Seq(0L, 7L, 42L, 99L, 123L)
    qids.map(rescoreRecall(sample, _, shortlist)).sum / qids.size
  }

  test("raw ADC: trained codebooks >= hash-sampled (both measured)") {
    val hashed = meanRecall(SimilaritySearch.pqSampleVectors(emb))
    val trained = meanRecall(SimilaritySearch.pqTrainedSample(emb))
    info(f"PQ ADC mean recall@10 over 5 queries: " +
      f"hash-sampled $hashed%.2f, trained $trained%.2f")
    assert(trained >= hashed - 0.05,
      f"trained ($trained%.2f) should not lose to hash-sampled ($hashed%.2f)")
    // 4-bit-per-subspace raw ADC is a shortlist generator, not a
    // searcher: the floor is deliberately modest
    assert(trained >= 0.25, f"trained PQ recall $trained%.2f < 0.25")
  }

  test("ADC shortlist + exact re-rank recovers recall (production shape)") {
    val trained = SimilaritySearch.pqTrainedSample(emb)
    val r50 = meanRescoreRecall(trained, 50)
    info(f"PQ ADC+rescore mean recall@10: shortlist=50 -> $r50%.2f")
    assert(r50 >= 0.7, f"rescored recall $r50%.2f < 0.7 at shortlist=50")
    // monotone in the shortlist knob (the quantization-error dial)
    val r100 = meanRescoreRecall(trained, 100)
    info(f"PQ ADC+rescore mean recall@10: shortlist=100 -> $r100%.2f")
    assert(r100 >= r50 - 1e-9)
  }

  test("composed IVF-PQ read path: k rows, inside the probed set, " +
    "measured recall") {
    val cents = SimilaritySearch.hashSampledCentroids(emb, 16)
    val bucketed = emb.join(
      SimilaritySearch.ivfAssignExact(emb, cents), Seq("vec_id"))
    val sample = SimilaritySearch.pqSampleVectors(emb)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val res = SimilaritySearch.ivfPqQuery(bucketed, cents, sample, q,
      k = 10, probes = 4, shortlist = 50).cache()
    assert(res.count() == 10)
    // the query's own vector has d2 = 0 and must win if its bucket is
    // probed (it is: its bucket is the one nearest to itself)
    assert(res.orderBy(col("d2").asc).head.getLong(0) == 0L)
    // every result must come from one of the 4 probed buckets (the same
    // probe rule ivfPqQuery applies: top-4 centroids by exact cosine)
    import graft.functions.VectorFunctions.cosineExact
    val probeBuckets = cents
      .withColumn("qsim", cosineExact(col("centroid"), typedlit(q.toSeq)))
      .orderBy(col("qsim").desc, col("centroid_id"))
      .limit(4).select(col("centroid_id").as("bucket"))
    val probedIds = bucketed.join(probeBuckets, Seq("bucket"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(res.collect().map(_.getLong(0)).toSet.subsetOf(probedIds))
    val recall = SimilaritySearch.recallAtK(
      l2Truth(q), res).head.getDouble(2)
    info(f"IVF-PQ (probes=4/16, shortlist=50) recall@10 = $recall%.2f")
    // IVF probing caps recall at what the probed buckets contain; the
    // hash-sampled codebook floor is deliberately modest
    assert(recall >= 0.4, f"IVF-PQ recall $recall%.2f < 0.4")
    res.unpersist()
  }
}
