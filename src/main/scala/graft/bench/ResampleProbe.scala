package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Resample

/** In-JVM rep probe for `q30_resample_ohlc` (r13 VERDICT "wrong" #1:
  * the only >1.5× committed-to-committed mover, with no code change on
  * its path since r12 — noise or structural?). The fresh-JVM bench
  * charges the cell first-query warmup (codegen JIT, scan init); this
  * probe separates that from the steady-state cost by running the
  * exact q30 dataflow `reps` times in ONE session, phase-split into
  * the events scan (count of the projected frame) and the OHLC
  * window+aggregate, plus the q31 gap-fill chain. Whichever number is
  * flat across in-JVM reps is the real cost; the delta to rep 1 is
  * warmup, and the delta between rounds' committed interleaved cells
  * is ambient-order warmth, not a plan change.
  *
  * Run: `sbt "runMain graft.bench.ResampleProbe [reps]"` with
  * `SPARK_GRAFT_SF_DIR` (default sf0.1). Results land in SCALE.md
  * §"q30 resample probe". */
object ResampleProbe {

  import BenchUtil.secs

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to reps) {
      val ev = graft.queries.Oracle.events(spark, dir)
        .select(col("event_id"), col("event_type"), col("ts"),
          col("value"))
      val scan = secs { ev.count(): Unit }
      val ohlc = secs {
        Resample.ohlc(ev, "ts", "value", 300L,
          keyCols = Seq("event_type"), tiebreak = Seq("event_id"))
          .foreach(_ => ())
      }
      val gapFill = secs {
        val hourly = Resample.ohlc(
          ev.filter(col("event_type") === "purchase"), "ts", "value",
          3600L, keyCols = Seq("event_type"),
          tiebreak = Seq("event_id"))
          .select(col("event_type"), col("bucket"), col("close"),
            col("n"))
        Resample.gapFillLocf(hourly, Seq("event_type"), "close")
          .foreach(_ => ())
      }
      println(f"""{"rep":$r,"scan":$scan%.3f,"ohlc":$ohlc%.3f,""" +
        f""""gap_fill":$gapFill%.3f}""")
    }
    spark.stop()
  }
}
