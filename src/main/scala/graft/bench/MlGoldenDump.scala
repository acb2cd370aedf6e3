package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.MlPipelines

/** Regenerate the `MlGoldenSpec` pins: prints the qm1 (RF, seed 42)
  * and qm3 (LinearSVC, seed 123) metric values at sf0.001 with the
  * catalog's exact call shape (`fitPartitions = Some(32)`). Run twice
  * and diff the output before updating the spec — the pins assume the
  * values are run-to-run stable. `sbt "runMain
  * graft.bench.MlGoldenDump"`. */
object MlGoldenDump {

  def main(args: Array[String]): Unit = {
    // the spec's session shape (SparkSpec uses local[4])
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val feat = graft.queries.Oracle.table(spark, dir, "lineitem").select(
      (col("l_quantity") > 25).cast("int").as("buy_or_sell"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_linenumber").cast("double").as("lineno"))
    val featCols =
      Seq("l_extendedprice", "l_discount", "l_tax", "lineno")
    val (_, rfPred) = MlPipelines.fitPredict(feat, featCols,
      MlPipelines.rfMllibParity(), fitPartitions = Some(32))
    val rf = MlPipelines.evaluate(rfPred)
    println(s"GOLDEN qm1 rf: auc=${rf("areaUnderROC")} " +
      s"acc=${rf("accuracy")} f1=${rf("f1")}")
    val (_, svmPred) = MlPipelines.fitPredict(feat, featCols,
      MlPipelines.svm(), seed = Some(123L), fitPartitions = Some(32))
    val svm = MlPipelines.evaluate(svmPred)
    println(s"GOLDEN qm3 svm: auc=${svm("areaUnderROC")} " +
      s"acc=${svm("accuracy")} f1=${svm("f1")}")
    spark.stop()
  }
}
