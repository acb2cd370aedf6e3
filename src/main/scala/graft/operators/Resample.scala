package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Oracle.avgd

/** Time-series resampling: minute bars → N-second OHLC bars, and
  * gap-filled forward-fill (LOCF) series — the two downsampling shapes a
  * bar-data pipeline needs above the reference's fixed minute granularity
  * (the reference consumes pre-resampled minute bars with indicators
  * already attached, `G_2_presentation.pdf` p.9; resampling is how those
  * bars are produced from ticks in the first place).
  *
  * Scale design:
  *   - the OHLC windows partition by (keys, bucket) — thousands of small
  *     groups, never a global sort; one shuffle total because both
  *     row_number directions and the final aggregate share the same
  *     (keys, bucket) hash partitioning (Spark reuses the Exchange).
  *   - open/close are selected by row_number over the deterministic
  *     (ts, tiebreak...) order, then folded with max(when(rn=1)) in the
  *     same aggregate as low/high/count — no self-join back.
  *   - the gap-fill spine is sequence()+explode per key: one row per key
  *     plus one generated row per bucket — never a driver-side loop; the
  *     forward fill is last(_, ignoreNulls) over the per-key bucket order
  *     (partitioned window, scalable).
  */
object Resample {

  /** Epoch-second bucket id of `ts` at `intervalSec` granularity
    * (floor division — stable across engines). */
  def bucketId(ts: Column, intervalSec: Long): Column =
    floor(unix_micros(ts.cast("timestamp")) / lit(intervalSec * 1000000L))
      .cast("long")

  /** OHLC resample of `valueCol` into `intervalSec` buckets per `keyCols`:
    * open/high/low/close + row count + exact mean. `tiebreak` columns make
    * open/close deterministic when timestamps collide.
    *
    * Output: keyCols ++ (bucket, open, high, low, close, n, avg_value).
    */
  def ohlc(df: DataFrame, tsCol: String, valueCol: String,
      intervalSec: Long, keyCols: Seq[String] = Nil,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val bucketed = df.withColumn("bucket", bucketId(col(tsCol), intervalSec))
    val part = (keyCols :+ "bucket").map(col)
    val ord = (col(tsCol) +: tiebreak.map(col))
    val wAsc = Window.partitionBy(part: _*).orderBy(ord: _*)
    val wDesc = Window.partitionBy(part: _*).orderBy(ord.map(_.desc): _*)
    bucketed
      .withColumn("_rn_a", row_number().over(wAsc))
      .withColumn("_rn_d", row_number().over(wDesc))
      .groupBy(part: _*)
      .agg(
        max(when(col("_rn_a") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("_rn_d") === 1, col(valueCol))).as("close"),
        count(lit(1)).as("n"),
        avgd(col(valueCol)).as("avg_value"))
  }

  /** Dense per-key bucket spine from each key's own [min, max] bucket
    * range, left-joined with `aggregated` (which must carry keyCols +
    * `bucket`), then forward-filled: every null `valueCol` takes the most
    * recent earlier non-null value of its key (LOCF). Adds `<valueCol>_ff`.
    */
  def gapFillLocf(aggregated: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val spine = aggregated
      .groupBy(keys: _*)
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(keys :+ explode(sequence(col("_b0"), col("_b1"))).as("bucket"): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(aggregated, keyCols :+ "bucket", "left")
      .withColumn(s"${valueCol}_ff",
        last(col(valueCol), ignoreNulls = true).over(w))
  }
}
