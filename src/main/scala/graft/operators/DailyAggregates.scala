package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily aggregates of the minute-bar table (SURVEY.md §2.4 A1–A3, §2.5 W3).
  *
  * Reference SQL (`G_2_rf_nordd_fe.py:47`, `G_2_rf_rdd_fe.py:87`):
  * {{{
  *   SELECT date_only, AVG(close) AS avg_close, AVG(lag_close) AS avg_close_prev_day
  *   FROM (SELECT date_only, close,
  *                LAG(close) OVER (ORDER BY date_only) AS lag_close
  *         FROM stock_data) subquery
  *   GROUP BY date_only
  * }}}
  * plus an RDD map/reduceByKey mean of `open` per day
  * (`G_2_rf_rdd_fe.py:131-148`) — which is exactly `groupBy.avg` with
  * Spark's partial aggregation playing the combiner.
  *
  * QUIRK (SURVEY.md §2.5 W3): `LAG(close) OVER (ORDER BY date_only)` orders
  * by a non-unique key (~390 rows per day), so the reference's
  * `avg_close_prev_day` is tie-broken arbitrarily and ends up within one
  * row's slippage of `avg_close` — NOT the previous day's average. We make
  * the compat variant deterministic by ordering on `(date_only, date)`
  * (identical values wherever the reference was deterministic) and offer the
  * intended semantics — `lag(avg_close) over (orderBy date_only)` on the
  * aggregated table — as the principled variant.
  *
  * Scale: the aggregate output is one row per trading day (~2k rows for the
  * reference's 8 years) — always broadcastable back to the minute table
  * (J2). The compat window is global-order; the principled variant's window
  * runs on the already-aggregated (tiny) table, so the expensive input scan
  * aggregates in parallel and only ~days rows pass through a single task.
  */
object DailyAggregates {

  /** Adds `date_only = to_date(date)` (P2, `G_2_rf_nordd.py:29`). */
  def withDateOnly(df: DataFrame): DataFrame =
    df.withColumn("date_only", to_date(col("date")))

  /** Compat variant: faithful to the reference's query shape, with the
    * lag ordering made deterministic by the unique `date` tiebreak. */
  def avgCloseCompat(df: DataFrame): DataFrame = {
    val w = Window.orderBy(col("date_only"), col("date"))
    withDateOnly(df)
      .select(col("date_only"), col("date"), col("close"))
      .withColumn("lag_close", lag(col("close"), 1).over(w))
      .groupBy(col("date_only"))
      .agg(
        avg(col("close")).as("avg_close"),
        avg(col("lag_close")).as("avg_close_prev_day"))
  }

  /** Principled variant: previous day's average really is yesterday's
    * average. Window runs over the aggregated table (one row per day). */
  def avgCloseIntended(df: DataFrame): DataFrame = {
    val daily = withDateOnly(df)
      .groupBy(col("date_only"))
      .agg(avg(col("close")).as("avg_close"))
    daily.withColumn("avg_close_prev_day",
      lag(col("avg_close"), 1).over(Window.orderBy(col("date_only"))))
  }

  /** `avg_open` per day — the reference's RDD map/reduceByKey pair
    * (F1, `G_2_rf_rdd_fe.py:131-148`) as a native hash aggregate. */
  def avgOpen(df: DataFrame): DataFrame =
    withDateOnly(df)
      .groupBy(col("date_only"))
      .agg(avg(col("open")).as("avg_open"))

  /** A2 pattern (`G_2_rf_rdd_fe.py:358` etc.): `GROUP BY date_only,
    * AVG(c), ORDER BY date_only` where `c` is constant per day — i.e. a
    * dedup in disguise. Provided verbatim; the optimizer-friendly equal
    * form is `dropDuplicates("date_only", c)`. The trailing sort is
    * destroyed by the subsequent join in the reference, so callers that
    * join should use `sorted = false`. */
  def dailyFirst(df: DataFrame, valueCol: String, sorted: Boolean = true)
      : DataFrame = {
    val agg = df.groupBy(col("date_only")).agg(avg(col(valueCol)).as(valueCol))
    if (sorted) agg.orderBy(col("date_only")) else agg
  }
}
