package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks (its joins are all 1-key
  * equi-joins — SURVEY.md §2.3) but a time-series engine needs as
  * first-class citizens: as-of join and sliding-window (range) join.
  *
  * Both are built so the physical plan never degenerates into a
  * nested-loop: Spark plans a non-equi theta join as
  * BroadcastNestedLoopJoin (O(N·M) — unusable at scale), so
  *  - the as-of join becomes a UNION + one window pass (single shuffle by
  *    key, no join at all);
  *  - the range join becomes a bucketed equi-join (shuffle by
  *    (key, time-bucket), residual range predicate applied post-match).
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the payload of the
    * right row with the greatest `rightTs <= leftTs` within the same key
    * group (the classic trades⟕quotes join; DuckDB/kdb `ASOF JOIN`,
    * `pandas.merge_asof`).
    *
    * Implementation: tag and union both sides, then one
    * `last(payload, ignoreNulls) OVER (PARTITION BY keys ORDER BY ts,
    * side ROWS UNBOUNDED PRECEDING..CURRENT)` pass — right rows sort
    * before left rows on ts ties so `<=` holds. ONE shuffle (by key),
    * linear in N+M, no join node. Rows with no prior right match are kept
    * (payload columns null) when `inner = false`, dropped otherwise.
    *
    * Right-side (key, ts) pairs should be unique — with duplicates the
    * surviving payload is the last in (ts, union) order, which is
    * deterministic only if the caller dedups.
    *
    * Output: every left column, plus each `rightPayload` column prefixed
    * with `rightPrefix`, plus `<rightPrefix><rightTs>` (the matched ts).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      rightPayload: Seq[String] = Seq("value"),
      rightPrefix: String = "asof_", inner: Boolean = true): DataFrame =
    asof(left, right, keys, leftTs, rightTs, rightPayload, rightPrefix,
      inner, direction = "backward")

  /** Forward as-of join: the right row with the SMALLEST `rightTs >=
    * leftTs` per key group (pandas `merge_asof(direction='forward')`).
    * Same single-shuffle union+window shape as backward, traversed in
    * descending ts order. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      rightPayload: Seq[String] = Seq("value"),
      rightPrefix: String = "asof_", inner: Boolean = true,
      toleranceSec: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTs, rightTs, rightPayload, rightPrefix,
      inner, direction = "forward", toleranceSec = toleranceSec)

  /** Nearest as-of join: the closer of the backward and forward matches
    * (ties break BACKWARD, pandas convention). One shuffle, two window
    * sorts over the same partitioning. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      rightPayload: Seq[String] = Seq("value"),
      rightPrefix: String = "asof_", inner: Boolean = true,
      toleranceSec: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTs, rightTs, rightPayload, rightPrefix,
      inner, direction = "nearest", toleranceSec = toleranceSec)

  /** The generalized as-of core. `direction`: backward | forward |
    * nearest; `toleranceSec` invalidates matches farther than the
    * tolerance from `leftTs` (they become null, so `inner` drops them) —
    * the full pandas `merge_asof` surface. Plan shape: ONE shuffle by
    * key; backward/forward sort once, nearest sorts twice over the same
    * Exchange (both windows share the partitioning, so Catalyst plans a
    * single exchange and two Sort nodes — still no join operator and
    * still linear). */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      rightPayload: Seq[String] = Seq("value"),
      rightPrefix: String = "asof_", inner: Boolean = true,
      direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction $direction")
    val lpCols = left.columns.toSeq
    val rpCols = (rightPayload :+ rightTs).distinct
    val lpType = left.select(struct(lpCols.map(col): _*).as("s"))
      .schema.head.dataType
    val rpType = right.select(struct(rpCols.map(col): _*).as("s"))
      .schema.head.dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(lpCols.map(col): _*).as("_lp"),
        lit(null).cast(rpType).as("_rp")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lpType).as("_lp"),
        struct(rpCols.map(col): _*).as("_rp")): _*)

    // backward scans ascending (right-before-left on ts ties makes `<=`
    // inclusive); forward scans descending with the same tie rule for `>=`
    def win(desc: Boolean) = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (desc) col("_ts").desc else col("_ts").asc,
        col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    def diffAbs(m: Column): Column =
      abs(micros(col("_ts")) - micros(m.getField(rightTs)))

    val matched = direction match {
      case "backward" => l2.unionByName(r2)
        .withColumn("_match", last(col("_rp"), ignoreNulls = true)
          .over(win(desc = false)))
      case "forward" => l2.unionByName(r2)
        .withColumn("_match", last(col("_rp"), ignoreNulls = true)
          .over(win(desc = true)))
      case "nearest" =>
        val u = l2.unionByName(r2)
          .withColumn("_mb", last(col("_rp"), ignoreNulls = true)
            .over(win(desc = false)))
          .withColumn("_mf", last(col("_rp"), ignoreNulls = true)
            .over(win(desc = true)))
        u.withColumn("_match",
          when(col("_mb").isNull, col("_mf"))
            .when(col("_mf").isNull, col("_mb"))
            .when(diffAbs(col("_mb")) <= diffAbs(col("_mf")), col("_mb"))
            .otherwise(col("_mf")))
          .drop("_mb", "_mf")
    }
    val toleranced = toleranceSec.fold(matched) { t =>
      matched.withColumn("_match",
        when(diffAbs(col("_match")) <= t * 1000000L, col("_match")))
    }
    val carried = toleranced.filter(col("_side") === 1)
    val filtered = if (inner) carried.filter(col("_match").isNotNull)
      else carried
    filtered.select(
      lpCols.map(c => col(s"_lp.$c").as(c)) ++
        rpCols.map(c => col(s"_match.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Sliding-window (range) join: inner-join every left row to the right
    * rows with `rightTs ∈ (leftTs - window, leftTs]` sharing the equi
    * `keys`. The range predicate is rewritten as a bucketed equi-join:
    * both sides bucket ts by `windowSec`, the left side probes its own
    * and the previous bucket (a 2-row explode — any match is within one
    * bucket of the probe because the window equals the bucket width), and
    * the exact range residual filters after the equi-match. Shuffles by
    * (keys, bucket) — never a nested loop. */
  def recentWindowJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    def bucketOf(ts: String): Column =
      floor(unix_micros(col(ts).cast("timestamp")) / (windowSec * 1000000L))
    val l2 = left
      .withColumn("_probe", explode(array(lit(0L), lit(1L))))
      .withColumn("_bucket", bucketOf(leftTs) - col("_probe"))
      .drop("_probe")
    val r2 = right.withColumn("_bucket", bucketOf(rightTs))
    val joinCond = keys.map(k => l2(k) === r2(k)).reduce(_ && _) &&
      l2("_bucket") === r2("_bucket") &&
      r2(rightTs) > l2(leftTs) - expr(s"INTERVAL $windowSec SECONDS") &&
      r2(rightTs) <= l2(leftTs)
    // keep one copy of each key; non-key column names must be disjoint
    // across the two sides (rename before calling)
    keys.foldLeft(
      l2.join(r2, joinCond).drop(l2("_bucket")).drop(r2("_bucket"))) {
      (d, k) => d.drop(r2(k))
    }
  }
}
