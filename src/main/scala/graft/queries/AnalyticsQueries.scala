package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Profile, Resample}

import Oracle._

/** Round-2 catalog: the analytics surfaces a complete engine still owes
  * beyond ExtendedQueries — grouping sets, distribution windows
  * (ntile/percent_rank/cume_dist), time-series resampling (OHLC bars) and
  * gap-filled forward fill, sketch aggregates sanity-checked against their
  * exact twins, column profiling, filtered aggregation, and per-group
  * top-k. Every query has a DuckDB twin.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Grouping sets — the explicit-subset member of the rollup(q18)/
    * cube(q24) family, with an aggregation level derived from the key
    * null pattern (keys are non-null in the data, so the pattern is
    * unambiguous). */
  val q27GroupingSets: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
      .withColumn("level",
        when(col("l_returnflag").isNull, 2)
          .when(col("l_linestatus").isNull, 1).otherwise(0))

  /** Distribution windows: ntile quartiles, percent_rank, cume_dist over
    * the per-user event order (partitioned — scalable by construction). */
  val q28DistWindows: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  /** OHLC resampling: per-event-type 5-minute bars
    * ([[graft.operators.Resample.ohlc]] — one shuffle, open/close via
    * deterministic row_number fold, no self-join). */
  val q30ResampleOhlc: Q = (s, dir) =>
    Resample.ohlc(
      events(s, dir).select(col("event_id"), col("event_type"), col("ts"),
        col("value")),
      "ts", "value", 300L, keyCols = Seq("event_type"),
      tiebreak = Seq("event_id"))

  /** Gap fill + LOCF over the hourly close series: dense per-key bucket
    * spine (sequence+explode — generated distributed, no driver loop),
    * forward-filled with last(ignoreNulls). */
  val q31GapFill: Q = (s, dir) => {
    val hourly = Resample.ohlc(
      events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("event_type"), col("ts"), col("value")),
      "ts", "value", 3600L, keyCols = Seq("event_type"),
      tiebreak = Seq("event_id"))
      .select(col("event_type"), col("bucket"), col("close"), col("n"))
    Resample.gapFillLocf(hourly, Seq("event_type"), "close")
      .select(col("event_type"), col("bucket"), col("n"), col("close"),
        col("close_ff"))
  }

  /** Sketch aggregates vs exact twins: HyperLogLog distinct count and
    * approximate median, each asserted within 5% of the exact value the
    * oracle recomputes — the scale path (sketches) validated against the
    * truth path in one query. */
  val q32ApproxAgg: Q = (s, dir) => {
    val e = events(s, dir)
    val exactP50 = e.groupBy().agg(
      expr("percentile(value, 0.5)").as("_p50")).head.getDouble(0)
    // rsd = 0.01: the default 0.05 makes a 5% gate a ±1σ coin flip (it
    // failed at sf0.1); at 1% relative error the 5% gate is ~5σ
    e.agg(
      count_distinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id"), 0.01).as("_approx_users"),
      expr("approx_percentile(value, 0.5)").as("_approx_p50"))
      .select(col("exact_users"),
        (abs(col("_approx_users") - col("exact_users")).cast("double")
          <= col("exact_users").cast("double") * 0.05).as("hll_within_5pct"),
        (abs(col("_approx_p50") - lit(exactP50))
          <= abs(lit(exactP50)) * 0.05).as("p50_within_5pct"))
  }

  /** Column profiling of `orders` (generalised null/dup guard —
    * [[graft.operators.Profile]]): one Expand pass, no per-column scans. */
  val q33Profile: Q = (s, dir) =>
    Profile.profile(table(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  /** Filtered aggregation (FILTER clause / count_if family): conditional
    * counts and exact conditional sums in one grouped pass. */
  val q34FilteredAgg: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        count_if(col("l_quantity") > 45).as("n_hi_qty"),
        sumd(when(col("l_discount") > 0.05, col("l_extendedprice")))
          .as("sum_discounted_price"),
        count_if(col("l_tax") === 0).as("n_tax_free"))

  /** Per-group top-k with ranks (TakeOrderedAndProject is global top-k —
    * q13; this is the partitioned form): top-3 orders by totalprice per
    * priority, deterministic tiebreak on the key. */
  val q35TopkPerGroup: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("price_rank"))
      .filter(col("price_rank") <= 3)
  }

  /** Frequent-items sketch vs the exact mode: `freqItems` (the
    * Karp-Shenker-Papadimitriou one-pass sketch) must contain the true
    * most-frequent event_type, which the oracle recomputes exactly. */
  val q36FreqItems: Q = (s, dir) => {
    val e = events(s, dir)
    val top = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))
      .limit(1).head.getString(0)
    e.stat.freqItems(Seq("event_type"), 0.1)
      .select(lit(top).as("top_type"),
        array_contains(col("event_type_freqItems"), top)
          .as("fi_contains_top"))
  }

  /** Time-based RANGE frame (vs q19's row frames): rolling 1-hour
    * event count and exact sum per user — the frame is defined by the
    * TIME distance, not the row count, so bursts widen the frame.
    * Ordered on epoch seconds (both engines use the same numeric range
    * semantics). Plus first_value/nth_value over the running row frame.
    */
  val q37TimeRangeFrame: Q = (s, dir) => {
    val sec = unix_micros(col("ts").cast("timestamp")) / lit(1000000L)
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-3600L, 0L)
    val run = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        sec.as("epoch_s"))
      .withColumn("n_last_hour", count(lit(1)).over(byTime))
      .withColumn("sum_last_hour",
        sum(col("value").cast(DecimalType(28, 6))).over(byTime)
          .cast("double"))
      .withColumn("first_val", first(col("value")).over(run))
      .withColumn("second_val", nth_value(col("value"), 2).over(run))
      .drop("epoch_s")
  }

  val defs: Map[String, Q] = Map(
    "q36_freq_items" -> q36FreqItems,
    "q37_time_range_frame" -> q37TimeRangeFrame,
    "q27_grouping_sets" -> q27GroupingSets,
    "q28_dist_windows" -> q28DistWindows,
    "q30_resample_ohlc" -> q30ResampleOhlc,
    "q31_gap_fill" -> q31GapFill,
    "q32_approx_agg" -> q32ApproxAgg,
    "q33_profile" -> q33Profile,
    "q34_filtered_agg" -> q34FilteredAgg,
    "q35_topk_per_group" -> q35TopkPerGroup)

  /** Shared OHLC SQL: two row_number directions + conditional fold, the
    * same shape the Spark operator plans. */
  private def ohlcSql(src: String, intervalUs: Long): String =
    s"""WITH numbered AS (
       |  SELECT event_type,
       |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / $intervalUs) AS BIGINT)
       |      AS bucket,
       |    value, ts, event_id,
       |    row_number() OVER (PARTITION BY event_type,
       |      CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / $intervalUs) AS BIGINT)
       |      ORDER BY ts, event_id) AS rn_a,
       |    row_number() OVER (PARTITION BY event_type,
       |      CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / $intervalUs) AS BIGINT)
       |      ORDER BY ts DESC, event_id DESC) AS rn_d
       |  FROM $src),
       |bars AS (
       |  SELECT event_type, bucket,
       |    max(CASE WHEN rn_a = 1 THEN value END) AS open,
       |    max(value) AS high, min(value) AS low,
       |    max(CASE WHEN rn_d = 1 THEN value END) AS close,
       |    count(*) AS n, ${sqlAvgd("value")} AS avg_value
       |  FROM numbered GROUP BY event_type, bucket)""".stripMargin

  val sql: Map[String, String] = Map(
    "q37_time_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  count(*) OVER tw AS n_last_hour,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) OVER tw AS DOUBLE)
        |    AS sum_last_hour,
        |  first_value(value) OVER rw AS first_val,
        |  nth_value(value, 2) OVER rw AS second_val
        |FROM (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) / 1000000
        |        AS epoch_s FROM events)
        |WINDOW
        |  tw AS (PARTITION BY user_id ORDER BY epoch_s
        |         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
        |  rw AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q36_freq_items" ->
      """SELECT (SELECT event_type FROM events GROUP BY event_type
        |        ORDER BY count(*) DESC, event_type LIMIT 1) AS top_type,
        |  true AS fi_contains_top""".stripMargin,
    "q27_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty,
         |  CASE WHEN l_returnflag IS NULL THEN 2
         |       WHEN l_linestatus IS NULL THEN 1 ELSE 0 END AS level
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |  (l_returnflag), ())""".stripMargin,
    "q28_dist_windows" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "q30_resample_ohlc" ->
      s"""${ohlcSql("events", 300000000L)}
         |SELECT * FROM bars""".stripMargin,
    "q31_gap_fill" ->
      s"""${ohlcSql("(SELECT * FROM events WHERE event_type = 'purchase')",
          3600000000L)},
         |bounds AS (
         |  SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
         |  FROM bars GROUP BY event_type),
         |spine AS (
         |  SELECT event_type, unnest(generate_series(b0, b1)) AS bucket
         |  FROM bounds)
         |SELECT s.event_type, s.bucket, b.n, b.close,
         |  last_value(b.close IGNORE NULLS) OVER (
         |    PARTITION BY s.event_type ORDER BY s.bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ff
         |FROM spine s LEFT JOIN bars b
         |  ON b.event_type = s.event_type AND b.bucket = s.bucket""".stripMargin,
    "q32_approx_agg" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  true AS hll_within_5pct, true AS p50_within_5pct
        |FROM events""".stripMargin,
    "q33_profile" -> Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS column_name,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q34_filtered_agg" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  count(*) FILTER (WHERE l_quantity > 45) AS n_hi_qty,
         |  ${sqlSumd("CASE WHEN l_discount > 0.05 THEN l_extendedprice END")}
         |    AS sum_discounted_price,
         |  count(*) FILTER (WHERE l_tax = 0) AS n_tax_free
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q35_topk_per_group" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
        |  FROM orders)
        |WHERE price_rank <= 3""".stripMargin)
}
