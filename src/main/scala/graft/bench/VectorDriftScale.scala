package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch
import graft.sources.{CommitLog, Occ, VectorIndex}

/** CENTROID-DRIFT decay curve for the persisted ANN index (r11 VERDICT
  * ask #5): refresh pins centroids by design, so the open question is
  * WHEN drift demands a rebuild. This harness measures, at churn
  * 10% / 30% / 50% of a drifted embedding distribution:
  *
  *  - the [[VectorIndex.driftReport]] ratio (batch mean best-cosine /
  *    build baseline) — the probe's signal;
  *  - recall@10 of drifted-distribution queries through the STALE
  *    (pinned-centroid) index vs through a REBUILT one, ground truth
  *    via exact brute-force [[SimilaritySearch.knnJoin]].
  *
  * Base corpus: hash-uniform dim-64 vectors (VectorIndexScale's
  * construction). Drift: new rows concentrate on a cone the base never
  * occupied (strong positive mass on the first 8 dims) — the
  * "yesterday's centroids don't cover today's topics" failure mode.
  * Queries are drawn FROM the drifted distribution: new queries follow
  * new data, which is exactly where stale centroids under-probe.
  *
  * Emits one JSON line per churn level; results land in SCALE.md
  * §"Centroid drift" and calibrate [[VectorIndex.DriftRebuildRatio]].
  * Run AFTER any bench artifact (page-cache discipline):
  * `sbt "runMain graft.bench.VectorDriftScale [nVectors]"`. */
object VectorDriftScale {

  import BenchUtil.rmrf

  private val Dim = 64
  private val K = 10
  private val Probes = 8
  private val NQueries = 20

  def main(args: Array[String]): Unit = {
    val n = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Clustered corpus — the shape real embeddings have (and the
    // shape IVF assumes: over structureless uniform noise, recall@8
    // probes is ~0.5 REGARDLESS of drift, measured here before this
    // construction). A row of mode m is that mode's hash-derived unit
    // center plus per-row jitter; base draws 32 modes, drift draws 4
    // NOVEL modes (disjoint hash space) the trained centroids have
    // never seen. All deterministic, no RNG.
    def mixture(from: Long, until: Long, nModes: Int,
        modeBase: Int) = {
      val mode = pmod(col("id"), lit(nModes)) + lit(modeBase)
      spark.range(from, until)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(Dim - 1)), j =>
            (((pmod(hash(mode, j), lit(100001)).cast("float") -
              lit(50000f)) / lit(50000f)) +
              ((pmod(hash(col("id"), j, lit(17)), lit(100001))
                .cast("float") - lit(50000f)) / lit(50000f)) * lit(0.35f))
              .cast("float")).as("embedding"))
    }
    def base(from: Long, until: Long) = mixture(from, until, 32, 0)
    def drifted(from: Long, until: Long) = mixture(from, until, 4, 1000)

    for (churn <- Seq(0.1, 0.3, 0.5, 1.0, 2.0)) {
      val root = f"/root/repo/target/scale/vdrift_${(churn * 100).toInt}"
      rmrf(root)
      val lake = s"$root/lake"
      val idx = s"$root/vidx"
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      base(0L, n).repartition(16).write.parquet(lake)
      CommitLog.commit(fs, lake, 0L,
        CommitLog.dataFileNames(fs, lake).toSeq.sorted)
      // trained centroids — the production build (class scaladoc);
      // hash-sampled ones are the oracle-reproducible test path
      VectorIndex.build(spark, lake, idx,
        VectorIndex.Params(c = 64, trainedCentroids = true))
      val nDrift = (n * churn).toLong
      require(Occ.append(spark, lake, drifted(n, n + nDrift),
        numFiles = 4) > 0L)
      val (_, assignedRows) = VectorIndex.refresh(spark, lake, idx)
      require(assignedRows == nDrift)
      val report = VectorIndex.driftReport(spark, idx).getOrElse(
        sys.error("drift report absent after a refresh"))

      // queries drawn ∝ the corpus composition (drifted fraction =
      // churn/(1+churn); ids beyond the corpus, so a query vector is
      // never its own trivial neighbour): the operator-relevant
      // recall is over the MIXED query population, and it decays with
      // the drifted fraction
      val nDriftQ = math.min(NQueries - 1L,
        math.max(1L, math.round(NQueries * churn / (1.0 + churn))))
      val queries = base(n + nDrift, n + nDrift + NQueries - nDriftQ)
        .unionAll(drifted(n + nDrift + NQueries - nDriftQ,
          n + nDrift + NQueries))
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        .localCheckpoint()
      val corpus = base(0L, n).unionAll(drifted(n, n + nDrift))
      val truth: Map[Long, Set[Long]] =
        SimilaritySearch.knnJoin(corpus, queries, K)
          .select(col("query_id"), col("vec_id"))
          .collect().groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val qvecs: Seq[(Long, Seq[Float])] = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq

      def recallThrough(indexDir: String, probes: Int): Double = {
        val per = qvecs.map { case (qid, qv) =>
          val got = VectorIndex.query(spark, lake, indexDir, qv,
            k = K, probes = probes)
            .collect().map(_.getLong(0)).toSet
          (got intersect truth(qid)).size.toDouble / K
        }
        per.sum / per.size
      }
      val recallStale = recallThrough(idx, Probes)
      val recallStale4 = recallThrough(idx, Probes / 2)
      val idx2 = s"$root/vidx_rebuilt"
      VectorIndex.build(spark, lake, idx2,
        VectorIndex.Params(c = 64, trainedCentroids = true))
      val recallRebuilt = recallThrough(idx2, Probes)
      val recallRebuilt4 = recallThrough(idx2, Probes / 2)
      println(f"""{"metric":"vector_index_drift","n":$n,"dim":$Dim,""" +
        f""""churn":$churn%.2f,"c":64,"probes":$Probes,""" +
        f""""drift_base_mean":${report.baseMean}%.4f,""" +
        f""""drift_last_mean":${report.lastRefreshMean}%.4f,""" +
        f""""drift_ratio":${report.ratio}%.4f,""" +
        f""""rebuild_advised":${report.rebuildAdvised},""" +
        f""""recall_stale":$recallStale%.3f,""" +
        f""""recall_stale_p4":$recallStale4%.3f,""" +
        f""""recall_rebuilt":$recallRebuilt%.3f,""" +
        f""""recall_rebuilt_p4":$recallRebuilt4%.3f}""")
    }
    spark.stop()
  }
}
