package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** SemDeDup (cluster-confined semantic pruning): hand-computed behaviour
  * on explicit centroids, plus the structural invariant on the real
  * corpus — the min-id member of every cluster is never pruned (it has
  * no smaller-id cluster-mate to dominate it). */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("semDedup prunes larger-id near-dups within a cluster only") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // cluster 0
      (1L, Array(0.9f, 0.1f)),   // cluster 0, cos(v0,v1) ≈ 0.994 -> pruned
      (2L, Array(0.0f, 1.0f)),   // cluster 1, alone -> kept
      (3L, Array(-1.0f, 0.05f))) // cluster 0 (|cos|max), cos<0 -> kept
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "centroid")
    val out = SimilaritySearch.semDedup(emb, cents, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2)))
      .toMap
    assert(out(0L) == (0, false))
    assert(out(1L) == (0, true))  // dominated by vec 0
    assert(out(2L) == (1, false))
    // vec 3 assigns to cluster 1 (cos 0.05 vs -0.999 for cluster 0) and
    // is NOT pruned: cos(v2, v3) ≈ 0.05 < τ
    assert(out(3L) == (1, false))
  }

  test("oversized-cluster backstop: a 90%-one-cluster adversarial " +
    "corpus completes with the saturated cluster excluded from the " +
    "pairwise phase — its members survive unpruned, every other " +
    "cluster still prunes, and the default cap leaves the real corpus " +
    "untouched") {
    // 1000 vectors, 900 collapsing onto centroid 0 (the degenerate
    // boilerplate-embedding distribution), 100 spread over centroid 1
    val emb = spark.range(1000).select(col("id").as("vec_id"),
      when(col("id") < 900,
        array(lit(1.0f), ((col("id") % 7) / lit(1000.0)).cast("float")))
        .otherwise(array(((col("id") % 5) / lit(1000.0)).cast("float"),
          lit(1.0f)))
        .as("embedding"))
    val cents = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "centroid")
    val out = SimilaritySearch.semDedup(emb, cents, tau = 0.99,
      maxCluster = 200).cache()
    try {
      assert(out.count() == 1000L, "every row must appear in the output")
      // cluster 0 (saturated, 900 > cap): excluded from pairing —
      // nothing pruned, cluster attribution intact
      val c0 = out.filter(col("cluster") === 0)
      assert(c0.count() == 900L)
      assert(c0.filter(col("pruned")).count() == 0L,
        "a capped cluster degrades to unpruned survivors, not a stall")
      // cluster 1 (100 <= cap): pruning still active — every member
      // is within tau of every other (the id%5 jitter moves cosine by
      // ~1e-5), so only the min id survives
      val c1p = out.filter(col("cluster") === 1 && col("pruned")).count()
      assert(c1p == 99L, s"expected 99 pruned in the healthy cluster, got $c1p")
    } finally { out.unpersist(); () }
    // the DEFAULT cap is far above any real cluster here: qv14's
    // answer is bit-identical with and without it
    val real = spark.read.parquet(sf("embeddings"))
    val rc = SimilaritySearch.hashSampledCentroids(real, 16)
    val withCap = SimilaritySearch.semDedup(real, rc, tau = 0.2)
    val uncapped = SimilaritySearch.semDedup(real, rc, tau = 0.2,
      maxCluster = Int.MaxValue)
    assert(withCap.exceptAll(uncapped).isEmpty &&
      uncapped.exceptAll(withCap).isEmpty)
  }

  test("corpus invariant: min-id member of each cluster is never pruned") {
    val emb = spark.read.parquet(sf("embeddings"))
    val out = SimilaritySearch.semDedup(emb,
      SimilaritySearch.hashSampledCentroids(emb, 16), tau = 0.2)
    val minIds = out.groupBy(col("cluster"))
      .agg(min(col("vec_id")).as("vec_id"))
    val badRows = out.join(minIds, Seq("cluster", "vec_id"))
      .filter(col("pruned")).count()
    assert(badRows == 0)
    // and pruning is non-trivial on the real corpus
    assert(out.filter(col("pruned")).count() > 0)
  }
}
