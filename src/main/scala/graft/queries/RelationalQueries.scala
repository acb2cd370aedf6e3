package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Oracle._

/** Core relational operator catalog over the driver's synthetic tables
  * (TESTDATA.md), one query per SURVEY.md §2 operator family. Each entry has
  * a DuckDB oracle twin in [[RelationalQueries.sql]].
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1/A3 — groupBy + sum/avg/count with map-side partial aggregation
    * (reference daily-aggregate pattern, `G_2_rf_nordd_fe.py:47`;
    * reduceByKey mean `G_2_rf_rdd_fe.py:131-148`). TPC-H-Q1 shape. */
  val q1Agg: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sumd(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        avgd(col("l_quantity")).as("avg_qty"),
        avgd(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** P1 — projection with filter pushed to the parquet scan
    * (select-minimal-columns pattern, `G_2_rf_rdd_fe.py:124`). */
  val q2Project: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .filter(col("l_quantity") > lit(45))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))

  /** P3 — when/otherwise conditional projection
    * (`G_2_rf_nordd.py:37` label expression). */
  val q3When: Q = (s, dir) =>
    table(s, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_totalprice") > lit(100000), lit(1)).otherwise(lit(0))
          .as("big_order"),
        when(col("o_orderstatus") === lit("F"), lit("done"))
          .otherwise(lit("open")).as("status_label"))

  /** J1 — large-large inner equi-join on a unique key (label join
    * `G_2_rf_nordd.py:40`): orders ⋈ customer. */
  val q4Join: Q = (s, dir) =>
    table(s, dir, "orders")
      .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))

  /** J2 — join against a small aggregate side; Spark broadcasts it
    * (daily-aggregate joins, `G_2_rf_nordd_fe.py:49`). */
  val q5JoinAgg: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(sumd(col("l_quantity")).as("order_qty"))
    li.join(broadcast(perOrder), Seq("l_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("order_qty"))
  }

  /** Multi-way join with broadcastable dims (scale: dims stay broadcast,
    * fact never shuffles for the dim joins). TPC-H-Q5 shape. */
  val q6MultiJoin: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    val c = table(s, dir, "customer")
    val n = table(s, dir, "nation")
    val r = table(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sumd(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** W1 — lag window (the labeling window, `G_2_rf_nordd.py:36`), made
    * deterministic by the unique `event_id` tiebreak. The SEMANTICS are
    * the reference's unpartitioned global order, but the PLAN is the
    * scalable range-partition + boundary-stitch form
    * ([[graft.operators.GlobalWindow]]) — bit-identical results without
    * the single-task window (SURVEY.md §2.5 W4). The per-key variant is
    * q8. */
  val q7WindowLag: Q = (s, dir) =>
    graft.operators.GlobalWindow.lagGlobal(
      events(s, dir).select(col("event_id"), col("ts"), col("value")),
      Seq("ts", "event_id"), "value", "prev_value",
      bucketKey = unix_micros(col("ts").cast("timestamp")))
      .withColumn("buy_or_sell",
        when(col("prev_value") > col("value"), lit(1)).otherwise(lit(0)))

  /** W2 + W4 — lead window partitioned by user (the scalable form of the
    * reference's global window, SURVEY.md §2.5 W4). */
  val q8WindowLeadPartitioned: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("next_value", lead(col("value"), 1).over(w))
  }

  /** A2/O1 — groupBy avg + ORDER BY (dedup-via-avg pattern,
    * `G_2_rf_rdd_fe.py:358`), on the event day. */
  val q9DailyAvg: Q = (s, dir) =>
    events(s, dir)
      .withColumn("date_only", to_date(col("ts")))
      .groupBy(col("date_only"))
      .agg(avgd(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .orderBy(col("date_only"))

  /** A1+W3 — the reference's exact avg_close/avg_close_prev_day shape
    * (`G_2_rf_nordd_fe.py:47`) on events: lag inside a subquery, then
    * daily aggregate, deterministic tiebreak on event_id. Global-order
    * SEMANTICS, scalable PLAN: the lag runs through
    * [[graft.operators.GlobalWindow]] (range buckets + boundary stitch)
    * instead of a single-task unpartitioned window (SURVEY.md §2.5 W4). */
  val q10AvgPrevDay: Q = (s, dir) =>
    graft.operators.GlobalWindow.lagGlobal(
      events(s, dir)
        .withColumn("date_only", to_date(col("ts")))
        .select(col("date_only"), col("ts"), col("event_id"), col("value")),
      Seq("date_only", "ts", "event_id"), "value", "lag_value",
      bucketKey = unix_micros(col("ts").cast("timestamp")))
      .groupBy(col("date_only"))
      .agg(
        avgd(col("value")).as("avg_value"),
        avgd(col("lag_value")).as("avg_value_prev"))

  /** P6/A5 — dropDuplicates (duplicate guard, ipynb cell 15). */
  val q11Distinct: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates()

  /** P7/A4 — na.drop + count (null guard, ipynb cell 17) as a 1-row result. */
  val q12NullGuard: Q = (s, dir) => {
    val df = table(s, dir, "orders")
    val total = df.count()
    val nonNull = df.na.drop().count()
    val s2 = s
    import s2.implicits._
    Seq((total, nonNull, total == nonNull)).toDF("n_total", "n_nonnull", "clean")
  }

  /** O1+P5 — total sort + limit (top-k) with a deterministic tiebreak. */
  val q13TopK: Q = (s, dir) =>
    table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** A6 — describe()-style summary stats, decimal-stabilized. */
  val q14Summary: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .agg(
        count(lit(1)).as("n"),
        avgd(col("l_quantity")).as("mean_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sumd(col("l_extendedprice")).as("sum_price"))

  /** A7 — skewness/kurtosis via explicit exact moments (Spark's and
    * DuckDB's built-ins use different bias corrections, so both sides
    * compute the population form from decimal-exact power sums; `pow` is
    * avoided — only IEEE-exact `* / sqrt` — so both engines emit the same
    * bits). */
  val q15Moments: Q = (s, dir) => {
    val x = col("l_quantity")
    table(s, dir, "lineitem")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sumd(x).as("s1"),
        sumd(x * x).as("s2"),
        sumd(x * x * x).as("s3"))
      .select(col("n"),
        (col("s1") / col("n")).as("m1"),
        (col("s2") / col("n")).as("m2"),
        (col("s3") / col("n")).as("m3"))
      .select(col("n"), col("m1"),
        (col("m2") - col("m1") * col("m1")).as("variance_pop"),
        col("m2"), col("m3"))
      .select(col("n"), col("m1"), col("variance_pop"),
        ((col("m3") - lit(3) * col("m1") * col("m2")
          + lit(2) * (col("m1") * col("m1") * col("m1")))
          / (col("variance_pop") * sqrt(col("variance_pop")))).as("skew_pop"))
  }

  /** Set ops (SURVEY.md §2.9 — absent in the reference, free in Spark):
    * union/intersect/except of customer key slices. */
  val q16SetOps: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val hi = c.filter(col("c_acctbal") > lit(5000)).select(col("c_custkey"))
    val seg = c.filter(col("c_mktsegment") === lit("BUILDING"))
      .select(col("c_custkey"))
    hi.intersect(seg).union(hi.except(seg))
      .withColumnRenamed("c_custkey", "custkey")
  }

  /** Semi/anti join surface: customers with and without open orders. */
  val q17SemiAnti: Q = (s, dir) => {
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders").filter(col("o_orderstatus") === lit("O"))
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey")).withColumn("has_open", lit(1))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey")).withColumn("has_open", lit(0))
    semi.union(anti)
  }

  /** Rollup/cube surface (beyond-reference; SURVEY.md §2.4 note). */
  val q18Rollup: Q = (s, dir) =>
    table(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))

  /** W1 at offset k > 1 — `LAG(value, 3)` over the GLOBAL order, through
    * [[graft.operators.GlobalWindow]]'s k-row tail stitch: the oracle
    * proves the stitch carries values across bucket boundaries at
    * distance 3 — the offset-k extension of q7's scalable plan. */
  val q40LagK: Q = (s, dir) =>
    graft.operators.GlobalWindow.lagGlobal(
      events(s, dir).select(col("event_id"), col("ts"), col("value")),
      Seq("ts", "event_id"), "value", "prev3_value",
      bucketKey = unix_micros(col("ts").cast("timestamp")),
      offset = 3)

  /** W4, general frames — rolling aggregates over the GLOBAL order
    * (`ROWS BETWEEN 4 PRECEDING AND CURRENT ROW`), through
    * [[graft.operators.GlobalWindow.rollingGlobal]]'s borrowed-row
    * stitch: any window aggregate, not just offsets, with no
    * single-partition exchange. Sum decimal-stabilized per the oracle
    * recipe (window sum ORDER differs between engines otherwise). */
  val q41RollingGlobal: Q = (s, dir) =>
    graft.operators.GlobalWindow.rollingGlobal(
      events(s, dir).select(col("event_id"), col("ts"), col("value")),
      Seq("ts", "event_id"),
      Seq(
        (sum(col("value").cast("decimal(28,6)")), "roll_sum"),
        (count(col("value")), "roll_n"),
        (min(col("value")), "roll_min")),
      frameRows = 5,
      bucketKey = unix_micros(col("ts").cast("timestamp")))
      // post-process OUTSIDE the window (aggs must be raw aggregates)
      .withColumn("roll_sum", col("roll_sum").cast("double"))

  /** W4, CENTERED frames over the GLOBAL order — `ROWS BETWEEN 3
    * PRECEDING AND 3 FOLLOWING` (the centered-smoothing shape real TA
    * uses) through
    * [[graft.operators.GlobalWindow.rollingGlobalCentered]]'s
    * both-sided borrowed-row stitch: each bucket borrows its global
    * preceding tail AND following head, so the oracle proves both
    * walks carry rows across bucket boundaries — including the
    * truncated frames at the global edges. */
  val q49CenteredGlobal: Q = (s, dir) =>
    graft.operators.GlobalWindow.rollingGlobalCentered(
      events(s, dir).select(col("event_id"), col("ts"), col("value")),
      Seq("ts", "event_id"),
      Seq(
        (sum(col("value").cast("decimal(28,6)")), "c_sum"),
        (count(col("value")), "c_n"),
        (max(col("value")), "c_max")),
      before = 3, after = 3,
      bucketKey = unix_micros(col("ts").cast("timestamp")))
      .withColumn("c_sum", col("c_sum").cast("double"))

  /** W4, time-RANGE frames over the GLOBAL order — last-10-minutes
    * aggregates per event via
    * [[graft.operators.GlobalWindow.rollingGlobalRange]]'s distributed
    * borrowed-band stitch (value-derived duplication, no driver
    * collect). Epoch micros is both the sort key and range dimension;
    * duplicate epochs are peers in both engines. */
  val q42RangeGlobal: Q = (s, dir) =>
    graft.operators.GlobalWindow.rollingGlobalRange(
      events(s, dir)
        .select(col("event_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("epoch_us")),
      "epoch_us",
      Seq(
        (sum(col("value").cast("decimal(28,6)")), "range_sum"),
        (count(col("value")), "range_n")),
      rangeBefore = 600L * 1000 * 1000) // 10 minutes of microseconds
      .withColumn("range_sum", col("range_sum").cast("double"))

  val defs: Map[String, Q] = Map(
    "q40_lag_k" -> q40LagK,
    "q41_rolling_global" -> q41RollingGlobal,
    "q42_range_global" -> q42RangeGlobal,
    "q49_centered_global" -> q49CenteredGlobal,
    "q1_agg" -> q1Agg,
    "q2_project" -> q2Project,
    "q3_when" -> q3When,
    "q4_join" -> q4Join,
    "q5_join_agg" -> q5JoinAgg,
    "q6_multi_join" -> q6MultiJoin,
    "q7_window_lag" -> q7WindowLag,
    "q8_window_lead_part" -> q8WindowLeadPartitioned,
    "q9_daily_avg" -> q9DailyAvg,
    "q10_avg_prev_day" -> q10AvgPrevDay,
    "q11_distinct" -> q11Distinct,
    "q12_null_guard" -> q12NullGuard,
    "q13_topk" -> q13TopK,
    "q14_summary" -> q14Summary,
    "q15_moments" -> q15Moments,
    "q16_set_ops" -> q16SetOps,
    "q17_semi_anti" -> q17SemiAnti,
    "q18_rollup" -> q18Rollup)

  val sql: Map[String, String] = Map(
    "q40_lag_k" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(value, 3) OVER (ORDER BY ts, event_id) AS prev3_value
        |FROM events""".stripMargin,
    "q41_rolling_global" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS roll_sum,
        |  count(value) OVER w AS roll_n,
        |  min(value) OVER w AS roll_min
        |FROM events
        |WINDOW w AS (ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q42_range_global" ->
      """SELECT event_id, value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS epoch_us,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS range_sum,
        |  count(value) OVER w AS range_n
        |FROM events
        |WINDOW w AS (ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q49_centered_global" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS c_sum,
        |  count(value) OVER w AS c_n,
        |  max(value) OVER w AS c_max
        |FROM events
        |WINDOW w AS (ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumd("l_quantity")} AS sum_qty,
         |  ${sqlSumd("l_extendedprice")} AS sum_base_price,
         |  ${sqlSumd("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${sqlAvgd("l_quantity")} AS avg_qty,
         |  ${sqlAvgd("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,
    "q3_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END AS big_order,
        |  CASE WHEN o_orderstatus = 'F' THEN 'done' ELSE 'open' END AS status_label
        |FROM orders""".stripMargin,
    "q4_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q5_join_agg" ->
      s"""SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, a.order_qty
         |FROM lineitem l
         |JOIN (SELECT l_orderkey, ${sqlSumd("l_quantity")} AS order_qty
         |      FROM lineitem GROUP BY l_orderkey) a
         |  ON l.l_orderkey = a.l_orderkey""".stripMargin,
    "q6_multi_join" ->
      s"""SELECT r_name, n_name,
         |  ${sqlSumd("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,
    "q7_window_lag" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(value) OVER (ORDER BY ts, event_id) AS prev_value,
        |  CASE WHEN lag(value) OVER (ORDER BY ts, event_id) > value
        |       THEN 1 ELSE 0 END AS buy_or_sell
        |FROM events""".stripMargin,
    "q8_window_lead_part" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        |FROM events""".stripMargin,
    "q9_daily_avg" ->
      s"""SELECT CAST(ts AS DATE) AS date_only,
         |  ${sqlAvgd("value")} AS avg_value, count(*) AS n
         |FROM events GROUP BY CAST(ts AS DATE) ORDER BY date_only""".stripMargin,
    "q10_avg_prev_day" ->
      s"""SELECT date_only,
         |  ${sqlAvgd("value")} AS avg_value,
         |  ${sqlAvgd("lag_value")} AS avg_value_prev
         |FROM (SELECT CAST(ts AS DATE) AS date_only, value,
         |        lag(value) OVER (ORDER BY CAST(ts AS DATE), ts, event_id) AS lag_value
         |      FROM events) sub
         |GROUP BY date_only""".stripMargin,
    "q11_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q12_null_guard" ->
      """SELECT count(*) AS n_total,
        |  count(CASE WHEN o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        |    AND o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
        |    THEN 1 END) AS n_nonnull,
        |  count(*) = count(CASE WHEN o_orderkey IS NOT NULL
        |    AND o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
        |    AND o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
        |    AND o_orderpriority IS NOT NULL THEN 1 END) AS clean
        |FROM orders""".stripMargin,
    "q13_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q14_summary" ->
      s"""SELECT count(*) AS n, ${sqlAvgd("l_quantity")} AS mean_qty,
         |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem""".stripMargin,
    "q15_moments" ->
      s"""WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  ${sqlSumd("l_quantity")} AS s1,
         |  ${sqlSumd("l_quantity * l_quantity")} AS s2,
         |  ${sqlSumd("l_quantity * l_quantity * l_quantity")} AS s3
         |  FROM lineitem),
         |m AS (SELECT n, (s1/n) AS m1, (s2/n) AS m2, (s3/n) AS m3 FROM s),
         |v AS (SELECT n, m1, (m2 - m1 * m1) AS variance_pop, m2, m3 FROM m)
         |SELECT n, m1, variance_pop,
         |  ((m3 - 3 * m1 * m2 + 2 * (m1 * m1 * m1))
         |    / (variance_pop * sqrt(variance_pop))) AS skew_pop
         |FROM v""".stripMargin,
    "q16_set_ops" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |) UNION ALL
        |SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |)""".stripMargin,
    "q17_semi_anti" ->
      """SELECT c_custkey, 1 AS has_open FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT c_custkey, 0 AS has_open FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin,
    "q18_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |  ${sqlSumd("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)
}
