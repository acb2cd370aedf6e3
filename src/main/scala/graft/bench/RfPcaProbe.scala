package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.MlPipelines
import graft.operators.GlobalWindow
import graft.schema.StockSchema

/** PHASE-SPLIT instrumentation of the `e2e_rf_pca` cell (r10 VERDICT
  * ask #7: its iso reps spread 2.0× — 7.2–14.1 s — making it the
  * widest cell after svm_pca settled; "measure, don't hypothesize").
  * Same protocol as [[SvmPcaProbe]]: one process, `reps` full
  * repetitions of exactly [[E2EBench.rfPca]]'s dataflow with a wall
  * clock around each phase — label+cache, the scaler fit, the k=12
  * PCA fit, the transformed-projection cache, the randomSplit
  * materialization, the RandomForest fit, and the evaluator pass.
  * Emits one JSON line per rep and a trimmed-mean + spread summary —
  * whichever phase moves across reps owns the spread. Results land
  * in SCALE.md §"e2e_rf_pca phase split". Run on an idle box, AFTER
  * any bench artifact: `sbt "runMain graft.bench.RfPcaProbe [reps]"`. */
object RfPcaProbe {

  import BenchUtil.secs

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = SyntheticBars.ensure(spark)
    spark.read.parquet(path).foreach(_ => ())
    val phases = Seq("label_cache", "scaler_fit", "pca_fit",
      "proj_cache", "split", "rf_fit", "eval")
    val all = scala.collection.mutable.ArrayBuffer[Map[String, Double]]()
    for (r <- 1 to reps) {
      val t = scala.collection.mutable.LinkedHashMap[String, Double]()
      val labeled = GlobalWindow.lagLabelGlobal(
        spark.read.parquet(path), Seq("date"),
        bucketKey = unix_micros(col("date"))).cache()
      t("label_cache") = secs { labeled.count(): Unit }
      // scaledPca, split into its two fits + the projection cache
      val va = MlPipelines
        .assembler(StockSchema.rfRawFeatures, "all_features")
        .transform(labeled)
      var scaled: org.apache.spark.sql.DataFrame = null
      t("scaler_fit") = secs {
        scaled = MlPipelines.scaler("all_features", "scaled_all_features")
          .fit(va).transform(va)
      }
      var model: org.apache.spark.ml.feature.PCAModel = null
      t("pca_fit") = secs {
        model = MlPipelines
          .pca("scaled_all_features", "pca_all_features", 12).fit(scaled)
      }
      val cached = model.transform(scaled)
        .select(col("buy_or_sell"), col("pca_all_features")).cache()
      t("proj_cache") = secs { cached.count(): Unit }
      var train: org.apache.spark.sql.DataFrame = null
      var test: org.apache.spark.sql.DataFrame = null
      t("split") = secs {
        val parts = cached.randomSplit(Array(0.7, 0.3), 42L)
        train = parts(0); test = parts(1)
        train.count(): Unit
      }
      val rf = MlPipelines.rfMllibParity()
        .setFeaturesCol("pca_all_features")
      var fitted: org.apache.spark.ml.classification
        .RandomForestClassificationModel = null
      t("rf_fit") = secs { fitted = rf.fit(train) }
      t("eval") = secs {
        MlPipelines.evaluate(fitted.transform(test)): Unit
      }
      cached.unpersist(); labeled.unpersist()
      val total = t.values.sum
      all += t.toMap
      println(s"""{"rep":$r,${t.map { case (k, v) =>
        f""""$k":$v%.2f""" }.mkString(",")},"total":${f"$total%.2f"}}""")
    }
    def tmean(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val core = if (s.size >= 4) s.drop(1).dropRight(1) else s
      core.sum / core.size
    }
    val summary = phases.map { p =>
      val xs = all.map(_(p)).toSeq
      f""""$p":{"tmean":${tmean(xs)}%.2f,"spread":${
        xs.max / math.max(xs.min, 1e-9)}%.2f}"""
    }
    println(
      s"""{"metric":"rf_pca_phases","reps":$reps,${summary.mkString(",")}}""")
  }
}
