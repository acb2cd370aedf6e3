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
