package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Quality gate for the TRAINED IVF path: k-means centroids aren't
  * SQL-expressible (so unlike qv8's hash-sampled twin they can't
  * hash-check against DuckDB), but their whole point is recall — which
  * is directly measurable against the brute-force ground truth. */
class IvfRecallSpec extends SparkSpec {

  private lazy val emb =
    graft.queries.Oracle.table(spark, "/root/testdata/sf0.001", "embeddings")

  test("kmeansCentroids: C rows, embedding-dim vectors, drop-in schema") {
    val cents = SimilaritySearch.kmeansCentroids(emb, 8, maxIter = 5)
    val rows = cents.collect()
    assert(rows.length == 8)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    assert(rows.forall(_.getSeq[Double](1).length == dim))
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 until 8))
  }

  private def recallAt(cents: org.apache.spark.sql.DataFrame,
      probes: Int): Double = {
    val bucketed = SimilaritySearch.ivfAssign(emb, cents)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    val approx = SimilaritySearch.ivfQuery(bucketed, cents, typedlit(qvec),
      k = 10, probes = probes)
    val truth = SimilaritySearch.bruteForceTopK(
      emb.crossJoin(broadcast(
        emb.filter(col("vec_id") === 0).select(col("embedding").as("qv")))),
      col("qv"), 10)
    val r = SimilaritySearch.recallAtK(truth, approx).head()
    assert(r.getLong(0) == 10L, "ground truth should have k=10 rows")
    r.getDouble(2)
  }

  // The testdata embeddings cluster on 10 labels, so C=8 centroids align
  // with the natural structure (C=16 over-partitions: a cluster's
  // neighbours split across buckets and per-bucket recall drops — the
  // classic IVF sizing effect; measured curve in SCALE.md).
  test("trained IVF centroids: recall@10 >= 0.9 at probes=4, C=8") {
    val recall = recallAt(SimilaritySearch.kmeansCentroids(emb, 8), 4)
    assert(recall >= 0.9,
      s"trained-centroid recall@10 = $recall < 0.9 at probes=4")
  }

  test("trained centroids beat hash-sampled at the same (C, probes)") {
    val trained = recallAt(SimilaritySearch.kmeansCentroids(emb, 8), 4)
    val sampled = recallAt(SimilaritySearch.hashSampledCentroids(emb, 8), 4)
    assert(trained >= sampled,
      s"k-means recall $trained < hash-sampled recall $sampled")
  }
}
