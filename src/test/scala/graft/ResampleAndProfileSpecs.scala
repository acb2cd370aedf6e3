package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Profile, Resample}

/** Specs for the round-2 operators: OHLC resampling, gap-fill/LOCF,
  * column profiling, near-dup clustering. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // two keys, two 5-min buckets, deliberate ts collision for the tiebreak
  lazy val ticks = Seq(
    ("A", ts("2020-01-06 09:30:05"), 1L, 10.0),
    ("A", ts("2020-01-06 09:31:00"), 2L, 14.0),
    ("A", ts("2020-01-06 09:31:00"), 3L, 8.0), // same ts: id 2 before id 3
    ("A", ts("2020-01-06 09:34:59"), 4L, 12.0),
    ("A", ts("2020-01-06 09:36:00"), 5L, 20.0),
    ("B", ts("2020-01-06 09:30:30"), 6L, 5.0)
  ).toDF("sym", "ts", "id", "v")

  test("ohlc: open/high/low/close/n per (key, bucket), deterministic ties") {
    val bars = Resample.ohlc(ticks, "ts", "v", 300L, Seq("sym"), Seq("id"))
      .orderBy($"sym", $"bucket").collect()
    assert(bars.length == 3)
    val a0 = bars(0) // A, first 5-min bucket
    assert(a0.getAs[Double]("open") == 10.0)
    assert(a0.getAs[Double]("high") == 14.0)
    assert(a0.getAs[Double]("low") == 8.0)
    assert(a0.getAs[Double]("close") == 12.0)
    assert(a0.getAs[Long]("n") == 4L)
    assert(a0.getAs[Double]("avg_value") == 11.0)
    val a1 = bars(1)
    assert(a1.getAs[Double]("open") == 20.0 &&
      a1.getAs[Double]("close") == 20.0 && a1.getAs[Long]("n") == 1L)
    val b0 = bars(2)
    assert(b0.getAs[String]("sym") == "B" && b0.getAs[Double]("open") == 5.0)
  }

  test("ohlc plans exactly one shuffle (windows + aggregate co-partition)") {
    val plan = Resample.ohlc(ticks, "ts", "v", 300L, Seq("sym"), Seq("id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("gapFillLocf: dense spine, forward-filled values") {
    val sparse = Seq(("A", 10L, 1.0), ("A", 13L, 4.0), ("B", 5L, 9.0))
      .toDF("sym", "bucket", "close")
    val filled = Resample.gapFillLocf(sparse, Seq("sym"), "close")
      .orderBy($"sym", $"bucket")
      .select($"sym", $"bucket", $"close_ff").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(filled.toSeq == Seq(
      ("A", 10L, 1.0), ("A", 11L, 1.0), ("A", 12L, 1.0), ("A", 13L, 4.0),
      ("B", 5L, 9.0)))
  }
}

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: per-column nulls and exact distincts in one pass") {
    val df = Seq(
      (Some(1), Some("x")), (Some(1), None), (None, Some("y"))
    ).toDF("a", "b")
    val p = Profile.profile(df, Seq("a", "b"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(p("a") == ((1L, 1L)))
    assert(p("b") == ((1L, 2L)))
  }
}

class DupSpanSpec extends SparkSpec {
  import spark.implicits._

  test("dupSpanFraction: shared 8-gram spans counted, short docs zeroed") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, shared + " one two three"),
      (2L, shared + " four five six"),
      (3L, "totally different words here that never repeat anywhere else"),
      (4L, "short doc") // < 8 tokens → 0 spans
    ).toDF("doc_id", "text")
    val r = graft.operators.Dedup.dupSpanFraction(docs)
      .collect().map(row => row.getLong(0) ->
        ((row.getLong(1), row.getLong(2), row.getDouble(3)))).toMap
    // docs 1/2: 4 distinct spans each (11 tokens → 4 windows), exactly
    // one (the shared prefix) occurs in both
    assert(r(1L) == ((4L, 1L, 0.25)))
    assert(r(2L) == ((4L, 1L, 0.25)))
    assert(r(3L)._2 == 0L && r(3L)._3 == 0.0)
    assert(r(4L) == ((0L, 0L, 0.0)))
  }
}

class DupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("dupClusters: transitive chains collapse to the min id") {
    // three copies of one text (pairwise LSH hits → one cluster) plus two
    // singletons with distinct texts
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (10L, dup), (11L, dup), (12L, dup),
      (20L, "completely different words forming another document body here"),
      (30L, "short")
    ).toDF("doc_id", "text")
    val clusters = Dedup.dupClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(10L) == 10L && clusters(11L) == 10L &&
      clusters(12L) == 10L)
    assert(clusters(20L) == 20L && clusters(30L) == 30L)
  }

  test("dupClusters: non-convergence throws (fallback disabled) instead " +
    "of returning partially propagated labels") {
    // a CHAIN (not a clique): doc i = tokens w_i .. w_{i+39}, so only
    // NEIGHBOURS overlap heavily (Jaccard ~0.95 → every adjacent LSH
    // link forms, deterministically — the hashes are fixed); the
    // 12-doc chain has diameter 11, which maxIter = 1 cannot finish
    val docs = (0 until 12).map { i =>
      (i.toLong, (0 until 40).map(j => s"w${i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.dupClustersWithRounds(docs, maxIter = 1,
        starFallback = false)._1.collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds the same chain collapses to cluster 0
    val ok = Dedup.dupClusters(docs, starFallback = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 12).forall(i => ok(i.toLong) == 0L),
      s"chain must collapse to doc 0: $ok")
  }

  test("dupClusters: large-star/small-star fallback converges the " +
    "stride chain without raising maxIter") {
    val docs = (0 until 12).map { i =>
      (i.toLong, (0 until 40).map(j => s"w${i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    // maxIter = 1 starves min-label propagation (diameter 11); the
    // default star fallback must still produce the full collapse —
    // and in O(log n) extra rounds, not O(diameter)
    val (out, rounds) = Dedup.dupClustersWithRounds(docs, maxIter = 1)
    val ok = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 12).forall(i => ok(i.toLong) == 0L),
      s"chain must collapse to doc 0: $ok")
    assert(rounds <= 1 + 8, s"star contraction took $rounds rounds")
  }

  test("starContract: star graphs, chains and singleton edges reach " +
    "the component min") {
    import org.apache.spark.sql.functions.col
    // components: chain 1-2-3-4-5, pair 10-11, triangle 20-21-22
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L),
      (11L, 10L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("src", "dst")
    val (out, _) = Dedup.starContract(edges)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(2L, 3L, 4L, 5L).forall(m(_) == 1L))
    assert(m(11L) == 10L)
    assert(m.getOrElse(20L, 20L) == 20L) // roots carry no out-edge
    assert(m(21L) == 20L && m(22L) == 20L)
  }
}
