package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.MlPipelines
import graft.operators.GlobalWindow
import graft.schema.StockSchema

/** Scratch diagnostic: stage-by-stage timing of the e2e_rf_pca cell. */
object PcaDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = SyntheticBars.ensure(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pca-debug] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    t("raw scan count") {
      spark.read.parquet(path).queryExecution.toRdd.count()
    }
    t("quantile pass") {
      spark.read.parquet(path)
        .select(unix_micros(col("date")).cast("double").as("_bk"))
        .stat.approxQuantile("_bk", (1 until 32).map(_ / 32.0).toArray, 0.001)
    }
    t("label uncached execute") {
      GlobalWindow.lagLabelGlobal(spark.read.parquet(path),
        Seq("date"), bucketKey = unix_micros(col("date")))
        .queryExecution.toRdd.count()
    }
    val labeled = t("label+cache count") {
      val l = GlobalWindow.lagLabelGlobal(spark.read.parquet(path),
        Seq("date"), bucketKey = unix_micros(col("date")))
      l.cache().count(); l
    }
    val (transformed, _) = t("scaledPca fit+plan") {
      MlPipelines.scaledPca(labeled, StockSchema.rfRawFeatures, k = 12,
        prefix = "all")
    }
    val cached = t("transform+cache") {
      val c = transformed.select(col("buy_or_sell"), col("pca_all_features"))
        .cache()
      c.count(); c
    }
    val Array(train, test) = cached.randomSplit(Array(0.7, 0.3), 42L)
    val rf = MlPipelines.rfMllibParity().setFeaturesCol("pca_all_features")
    val model = t("rf.fit")(rf.fit(train))
    t("evaluate") {
      MlPipelines.evaluate(model.transform(test))("areaUnderROC")
    }
    spark.stop()
  }
}
