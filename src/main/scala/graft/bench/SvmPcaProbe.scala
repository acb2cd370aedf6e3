package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.MlPipelines
import graft.operators.GlobalWindow
import graft.schema.StockSchema

/** PHASE-SPLIT instrumentation of the `e2e_svm_pca` cell (r9 VERDICT
  * ask #4: "measure, don't hypothesize" its 1.8× rep spread). One
  * process, `reps` full repetitions of exactly [[E2EBench.svmPca]]'s
  * dataflow with a wall clock around each phase: label+cache,
  * assembled cache, the three scaler fits, the scaled cache, the two
  * PCA fits (k=59 scree, k=12), and the SVC leg split into
  * assemble/split vs fit vs evaluate. Emits one JSON line per rep and
  * a trimmed-mean summary — whichever phase moves across reps is the
  * spread's owner. Results land in SCALE.md §"e2e_svm_pca phase
  * split". Run on an idle box, AFTER any bench artifact is written:
  * `sbt "runMain graft.bench.SvmPcaProbe [reps]"`. */
object SvmPcaProbe {

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
    // one untimed warm pass (page cache + JIT), as the bench protocol
    spark.read.parquet(path).foreach(_ => ())
    val phases = Seq("label_cache", "va_cache", "scaler_fit_main",
      "scaled_cache", "scaler_fit_corr", "scaler_fit_noncorr",
      "pca_scree_fit", "pca_k12_fit", "svc_split", "svc_fit", "svc_eval")
    val all = scala.collection.mutable.ArrayBuffer[Map[String, Double]]()
    for (r <- 1 to reps) {
      val t = scala.collection.mutable.LinkedHashMap[String, Double]()
      val labeled = GlobalWindow.lagLabelGlobal(
        spark.read.parquet(path), Seq("date"),
        bucketKey = unix_micros(col("date"))).cache()
      t("label_cache") = secs { labeled.count(): Unit }
      val va = MlPipelines
        .assembler(StockSchema.rfRawFeatures, "all_features")
        .transform(labeled).select(col("all_features")).cache()
      t("va_cache") = secs { va.count(): Unit }
      var scaledDf: org.apache.spark.sql.DataFrame = null
      t("scaler_fit_main") = secs {
        scaledDf = MlPipelines.scaler("all_features", "scaled_all_features")
          .fit(va).transform(va).select(col("scaled_all_features")).cache()
      }
      t("scaled_cache") = secs { scaledDf.count(): Unit }
      t("scaler_fit_corr") = secs {
        MlPipelines.scaler("all_features", "scaled_corr_features")
          .fit(va): Unit
      }
      t("scaler_fit_noncorr") = secs {
        MlPipelines.scaler("all_features", "scaled_non_corr_features")
          .fit(va): Unit
      }
      val nComp = StockSchema.rfRawFeatures.length
      t("pca_scree_fit") = secs {
        MlPipelines.pca("scaled_all_features", "pca_scree", nComp)
          .fit(scaledDf): Unit
      }
      t("pca_k12_fit") = secs {
        MlPipelines.pca("scaled_all_features", "pca_all_features", 12)
          .fit(scaledDf): Unit
      }
      // the SVC leg, split: fitPredict's assemble+cache+randomSplit,
      // the LinearSVC fit itself, then the three-evaluator pass
      val svcAsm = MlPipelines.assembler(StockSchema.svmFeatures)
        .transform(labeled)
        .select(col("buy_or_sell"), col("features")).cache()
      var train: org.apache.spark.sql.DataFrame = null
      var test: org.apache.spark.sql.DataFrame = null
      t("svc_split") = secs {
        val parts = svcAsm.randomSplit(Array(0.7, 0.3), 123L)
        train = parts(0); test = parts(1)
        train.count(): Unit
      }
      var model: org.apache.spark.ml.classification.LinearSVCModel = null
      t("svc_fit") = secs {
        model = MlPipelines.svm().fit(train)
      }
      t("svc_eval") = secs {
        MlPipelines.evaluate(model.transform(test)): Unit
      }
      svcAsm.unpersist(); scaledDf.unpersist(); va.unpersist()
      labeled.unpersist()
      val total = t.values.sum
      all += t.toMap
      println(s"""{"rep":$r,${t.map { case (k, v) =>
        f""""$k":$v%.2f""" }.mkString(",")},"total":${f"$total%.2f"}}""")
    }
    // trimmed mean (drop min and max when reps >= 4) + spread per phase
    def tmean(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val core = if (s.size >= 4) s.drop(1).dropRight(1) else s
      core.sum / core.size
    }
    val summary = phases.map { p =>
      val xs = all.map(_(p)).toSeq
      f""""$p":{"tmean":${tmean(xs)}%.2f,"spread":${xs.max / math.max(xs.min, 1e-9)}%.2f}"""
    }
    println(s"""{"metric":"svm_pca_phases","reps":$reps,${summary.mkString(",")}}""")
  }
}
