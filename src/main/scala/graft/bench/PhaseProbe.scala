package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.MlPipelines
import graft.operators.GlobalWindow
import graft.schema.StockSchema

/** Phase-level breakdown of the e2e cells that move between rounds —
  * the measurement the round-over-round pair table can't provide: WHICH
  * phase inside a cell shifted. Runs the `e2e_svm_pca` phases in a
  * fresh session with the same untimed small-scale warmup as the iso
  * bench protocol and prints one line per phase.
  *
  * Usage: `sbt "runMain graft.bench.PhaseProbe"` (env:
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_PROBE_REPS, default 3 reps).
  */
object PhaseProbe {

  private def t[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = SyntheticBars.ensure(spark)
    // iso-protocol warmup: full cell once at small scale, untimed
    val warm = SyntheticBars.ensure(spark, 20000)
    try E2EBench.svmPca(spark, warm) catch { case _: Throwable => () }
    spark.sharedState.cacheManager.clearCache()

    (1 to reps).foreach { rep =>
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val phases = Seq.newBuilder[(String, Double)]
      val (labeled, tLabel) = t {
        val l = GlobalWindow.lagLabelGlobal(spark.read.parquet(path),
          Seq("date"), bucketKey = unix_micros(col("date"))).cache()
        l.count()
        l
      }
      phases += "label_window_cache" -> tLabel
      val (va, tVa) = t {
        val v = MlPipelines.assembler(StockSchema.rfRawFeatures,
          "all_features").transform(labeled).cache()
        v.count()
        v
      }
      phases += "assemble_cache" -> tVa
      val (scaled, tS1) = t {
        val s = MlPipelines.scaler("all_features", "scaled_all_features")
          .fit(va).transform(va).cache()
        s.count()
        s
      }
      phases += "scaler_fit1_cache" -> tS1
      phases += "scaler_fit2" -> t(
        MlPipelines.scaler("all_features", "scaled_corr_features")
          .fit(va))._2
      phases += "scaler_fit3" -> t(
        MlPipelines.scaler("all_features", "scaled_non_corr_features")
          .fit(va))._2
      val nComp = StockSchema.rfRawFeatures.length
      phases += "pca_scree_fit_k59" -> t(
        MlPipelines.pca("scaled_all_features", "pca_scree", nComp)
          .fit(scaled))._2
      phases += "pca_fit_k12" -> t(
        MlPipelines.pca("scaled_all_features", "pca_all_features", 12)
          .fit(scaled))._2
      phases += "svm_train_eval" -> t {
        val (_, pred) = MlPipelines.fitPredict(labeled,
          StockSchema.svmFeatures, MlPipelines.svm(), seed = Some(123L))
        MlPipelines.evaluate(pred)("areaUnderROC")
        pred.unpersist()
      }._2
      scaled.unpersist(); va.unpersist(); labeled.unpersist()
      val ps = phases.result()
      val total = ps.map(_._2).sum
      println(f"[probe] rep $rep total=$total%.1f  " +
        ps.map { case (n, s) => f"$n=$s%.1f" }.mkString("  "))
    }
    spark.stop()
  }
}
