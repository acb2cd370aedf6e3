package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.10 / §7.5).
  *
  * The reference is pure batch; streaming bars ("Time Series Buffering",
  * multi-stock streams) are its stated future work
  * (`G_2_presentation.pdf` p.31-34). This module provides that extension
  * Spark-first: `readStream` → watermarked tumbling windows reusing the
  * batch daily-aggregate semantics, plus stateful per-key labeling via
  * `flatMapGroupsWithState` (the streaming analogue of the batch
  * lag-window label, which needs remembered state because a stream can't
  * sort globally).
  */
object StreamingAggregates {

  /** File-source stream of bar/event rows. */
  def readStream(spark: SparkSession, schema: StructType, path: String,
      tsCol: String = "ts"): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked tumbling daily aggregate — the streaming twin of
    * `DailyAggregates.avgOpen`/`avgClose`: one row per (day, key) emitted
    * once the watermark passes the day boundary. */
  def dailyAggregate(events: DataFrame, tsCol: String, valueCol: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("day_window"))
      .agg(
        avg(col(valueCol)).as("avg_value"),
        count(lit(1)).as("n"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(col("day_window.start").as("day_start"),
        col("avg_value"), col("n"), col("min_value"), col("max_value"))

  /** Sliding-window aggregate (the reference's future-work "sliding
    * window" input shape for sequence models). */
  def slidingAggregate(events: DataFrame, tsCol: String, valueCol: String,
      windowLen: String = "10 minutes", slide: String = "1 minute"): DataFrame =
    events
      .withWatermark(tsCol, "30 minutes")
      .groupBy(window(col(tsCol), windowLen, slide))
      .agg(avg(col(valueCol)).as("avg_value"), count(lit(1)).as("n"))

  case class KeyedValue(key: Long, ts: java.sql.Timestamp, value: Double)
  case class LabeledValue(key: Long, ts: java.sql.Timestamp, value: Double,
      buyOrSell: Int)
  case class LastSeen(value: Double)

  /** Stateful streaming labeler: per key, label each arriving value
    * against the previously seen one — the streaming equivalent of the
    * batch `lag(value) over (partition by key order by arrival)` label
    * (compat LAG semantics: 1 iff previous > current, first row 0). */
  def statefulLabel(events: Dataset2)(implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[LabeledValue] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[LastSeen, LabeledValue](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[KeyedValue], state: GroupState[LastSeen]) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[LabeledValue]
          var prev = state.getOption
          rows.toSeq.sortBy(_.ts.getTime).foreach { r =>
            val label = prev match {
              case Some(LastSeen(p)) if p > r.value => 1
              case _ => 0
            }
            buf += LabeledValue(r.key, r.ts, r.value, label)
            prev = Some(LastSeen(r.value))
          }
          prev.foreach(state.update)
          buf.iterator
      }
  }
  type Dataset2 = org.apache.spark.sql.Dataset[KeyedValue]

  /** [[statefulLabel]] on Spark 4's `transformWithState` API (the
    * successor to flatMapGroupsWithState: named state variables, TTL,
    * timers, RocksDB-backed). Same semantics — per-key LAG label with
    * in-batch ts ordering — so the two APIs cross-check each other
    * against one oracle. Requires the RocksDB state-store provider
    * (set by the caller; see `StreamQueryCatalog.qs7`). */
  class LagLabelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, KeyedValue, LabeledValue] {
    @transient private var last:
      org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      last = getHandle.getValueState[Double]("last",
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedValue],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[LabeledValue] =
      rows.toSeq.sortBy(_.ts.getTime).iterator.map { r =>
        val label =
          if (last.exists() && last.get() > r.value) 1 else 0
        last.update(r.value)
        LabeledValue(r.key, r.ts, r.value, label)
      }
  }

  def statefulLabelTws(events: Dataset2)(implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[LabeledValue] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new LagLabelProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append)
  }

  /** Drive a streaming query to completion over static files (memory sink)
    * — the local-smoke harness shape. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode)
      : StreamingQuery = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q
  }

  /** `foreachBatch` sink reusing BATCH aggregation logic per micro-batch
    * (SURVEY.md §7.5): each batch's rows aggregate with the caller's
    * batch function, then upsert into a partitioned parquet sink by
    * dynamic partition OVERWRITE on the day key.
    *
    * Idempotence: update-mode emits a (day, aggregate) row whenever a
    * day's state changes; overwriting that day's partition with the
    * latest value makes replays and batch-boundary changes converge to
    * the same files — the exactly-once-by-overwrite pattern Structured
    * Streaming recommends for file sinks with aggregations (which the
    * built-in file sink cannot do: it is append-only).
    */
  def foreachBatchDaily(events: DataFrame, tsCol: String, valueCol: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(org.apache.spark.sql.functions.col(tsCol), "1 day")
        .as("w"))
      .agg(
        sum(org.apache.spark.sql.functions.col(valueCol)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .select(col("w.start").cast("date").as("day"),
        col("sum_value"), col("n"))
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // dynamic overwrite scoped to THIS write (not the shared session
        // conf, which would silently flip every later partitioned
        // overwrite in the session into a partial one)
        batch.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("day").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow()).start()
  }
}
