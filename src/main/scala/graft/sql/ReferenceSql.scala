package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's SQL surface, kept queryable verbatim (SURVEY.md §7.1
  * `sql/`): view registration plus the exact SQL texts the reference
  * issues, so a user migrating from the reference can paste their
  * queries unchanged.
  */
object ReferenceSql {

  /** The reference's temp-view name (`G_2_rf_nordd.py:32`). */
  val ViewName = "stock_data"

  def register(bars: DataFrame): Unit =
    bars.createOrReplaceTempView(ViewName)

  /** W1 — the labeling window, verbatim (`G_2_rf_nordd.py:36`). Note the
    * reference's own quirk is preserved: the alias says `next_high` but
    * the function is LAG (SURVEY.md §2.12.1). */
  val LabelSql: String =
    s"SELECT date, high, LAG(high) OVER (ORDER BY date) AS next_high FROM $ViewName"

  /** A1 — daily average close + lagged-close average, verbatim
    * (`G_2_rf_nordd_fe.py:47`). */
  val AvgCloseSql: String =
    s"""SELECT date_only, AVG(close) AS avg_close,
       | AVG(lag_close) AS avg_close_prev_day FROM
       | (SELECT date_only, close,
       |   LAG(close) OVER (ORDER BY date_only) AS lag_close
       |  FROM $ViewName) subquery
       |GROUP BY date_only""".stripMargin

  /** A2 — the dedup-via-avg daily aggregate shape, verbatim
    * (`G_2_rf_rdd_fe.py:358`, momentum instance). */
  def dailyAvgSql(valueCol: String): String =
    s"""SELECT date_only, AVG($valueCol) as $valueCol FROM $ViewName
       |GROUP BY date_only ORDER BY date_only""".stripMargin

  def label(spark: SparkSession): DataFrame = spark.sql(LabelSql)
  def avgClose(spark: SparkSession): DataFrame = spark.sql(AvgCloseSql)
}
