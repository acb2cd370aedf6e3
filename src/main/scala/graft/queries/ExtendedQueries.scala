package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.TemporalJoins
import graft.sources.ZOrder

import Oracle._

/** Operator families beyond the reference's surface that a complete
  * analytics engine must carry (SURVEY.md §2.4/§2.5 notes, §7.5):
  * ranking + frame windows, as-of join, sliding-window range join, pivot,
  * exact correlation, cube. Every query has a DuckDB twin — the as-of
  * oracle uses DuckDB's own `ASOF JOIN`, i.e. an independent
  * implementation, not a transliteration of ours.
  */
object ExtendedQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Ranking + analytic frames (absent in the reference — SURVEY.md §2.5
    * "not used"): row_number / rank / dense_rank and a decimal-exact
    * moving sum, all sharing ONE window partition spec so the plan sorts
    * each group once. */
  val q19RankFrames: Q = (s, dir) => {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    // (…, l_partkey, l_suppkey) is — the full tiebreak makes row_number
    // and the moving frame deterministic across engines
    val byLine = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val byQty = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity").desc, col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        row_number().over(byLine).as("rn"),
        rank().over(byQty).as("qty_rank"),
        dense_rank().over(byQty).as("qty_dense_rank"),
        sum(col("l_quantity").cast(DecimalType(28, 6)))
          .over(byLine.rowsBetween(-2, 0)).cast("double")
          .as("moving_qty_3"))
  }

  /** As-of join (trades ⟕ most recent prior quote per user): purchases
    * matched to the latest preceding view event. Spark side is the
    * union+window single-shuffle plan in
    * [[graft.operators.TemporalJoins.asofBackward]]; the oracle is
    * DuckDB's native ASOF JOIN. */
  val q20AsofJoin: Q = (s, dir) => {
    val e = events(s, dir)
    val trades = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("trade_value"))
    val quotes = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    TemporalJoins.asofBackward(trades, quotes, Seq("user_id"),
      rightPayload = Seq("value"), rightPrefix = "quote_")
      .withColumnRenamed("quote_value", "quote_val")
  }

  /** Forward as-of with a one-hour tolerance
    * ([[graft.operators.TemporalJoins.asofForward]]): each purchase
    * matched to the NEXT view of the same user within 3600 s — the
    * "what did they see right after buying" join. The oracle recomputes
    * it as a rank-over-theta-join (independent formulation). */
  val q38AsofForward: Q = (s, dir) => {
    val e = events(s, dir)
    val trades = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("trade_value"))
    val quotes = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    TemporalJoins.asofForward(trades, quotes, Seq("user_id"),
      rightPayload = Seq("value"), rightPrefix = "quote_",
      toleranceSec = Some(3600))
      .withColumnRenamed("quote_value", "quote_val")
  }

  /** Nearest as-of ([[graft.operators.TemporalJoins.asofNearest]]):
    * each purchase matched to the temporally closest view either side
    * (ties backward, pandas convention). */
  val q39AsofNearest: Q = (s, dir) => {
    val e = events(s, dir)
    val trades = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("trade_value"))
    val quotes = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    TemporalJoins.asofNearest(trades, quotes, Seq("user_id"),
      rightPayload = Seq("value"), rightPrefix = "quote_")
      .withColumnRenamed("quote_value", "quote_val")
  }

  /** Sliding-window range join: clicks within the 10 minutes before each
    * error event of the same user, counted per error (zero-click errors
    * kept). The range predicate runs as a bucketed equi-join
    * ([[graft.operators.TemporalJoins.recentWindowJoin]]) — never a
    * nested loop. */
  val q21RangeJoin: Q = (s, dir) => {
    val e = events(s, dir)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val matched = TemporalJoins.recentWindowJoin(errors, clicks,
      Seq("user_id"), "ts", "click_ts", 600L)
    val counts = matched.groupBy(col("event_id"))
      .agg(count(col("click_id")).as("n_clicks_inner"))
    errors.join(counts, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_clicks_inner"), lit(0L)).as("n_clicks"))
  }

  /** Pivot (native confusion-matrix shape, SURVEY.md §2.11 M14): order
    * counts and exact totals per priority × status. Explicit pivot values
    * keep the output schema static — at scale an implicit pivot would
    * first run a distinct scan. */
  val q22Pivot: Q = (s, dir) =>
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** Exact Pearson correlation (A8 — the reference computes it in pandas;
    * ours stays distributed): assembled from decimal-exact power sums so
    * both engines emit identical bits; one partial-aggregable pass. */
  val q23Corr: Q = (s, dir) => {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    table(s, dir, "lineitem")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sumd(x).as("sx"), sumd(y).as("sy"),
        sumd(x * x).as("sxx"), sumd(y * y).as("syy"),
        sumd(x * y).as("sxy"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_price"))
  }

  /** Cube (grouping-set family; rollup is q18): counts + exact totals
    * over all subsets of (returnflag, linestatus). */
  val q24Cube: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))

  /** Frame-indicator shapes (`graft.indicators.Indicators`) on the events
    * table: per-key SMA/MOM/min/max over row frames, decimal-stabilised.
    * The recursive EMA family has no portable SQL twin (first-order
    * recurrence) — it is cross-checked in `IndicatorSpec` against the
    * mapPartitions twin instead. */
  val qi1IndicatorFrames: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val f3 = w.rowsBetween(-2, 0)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("sma3",
        sum(col("value").cast(DecimalType(28, 6))).over(f3).cast("double")
          / count(col("value")).over(f3).cast("double"))
      .withColumn("mom2", col("value") - lag(col("value"), 2).over(w))
      .withColumn("min3", min(col("value")).over(f3))
      .withColumn("max3", max(col("value")).over(f3))
  }

  /** Semi-structured surface: JSON props extraction (`get_json_object`
    * path access + typed cast), then a grouped count over the extracted
    * value — the schema-on-read shape every training-data pipeline hits. */
  val qj1Json: Q = (s, dir) =>
    events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("k_bucket", col("k") % 10)

  /** Sessionization: gap-based session ids per user (30-minute timeout)
    * — one cumulative-sum window pass, the canonical clickstream/
    * training-data grouping operator. */
  val q25Sessionize: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("new_session",
        when(unix_micros(col("ts").cast("timestamp"))
          - unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))
          > 1800L * 1000000L, lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .drop("new_session")
  }

  /** Exact lower-median per group — rank-selected, no float
    * interpolation, so both engines agree bit-exactly (a percentile_cont
    * oracle would hinge on interpolation arithmetic).
    *
    * Two-phase count-histogram plan: aggregate (group, value) counts
    * (partial-aggregable — the full table never sorts), then pick the
    * value whose cumulative count first reaches the lower-median rank
    * with a window over the TINY histogram. The naive plan — row_number
    * over Window.partitionBy(group) on the raw table — sorts the whole
    * table across only #groups tasks (3 here): at 100 TB that is 3 tasks
    * doing everything. The histogram plan's heavy phase is a plain
    * parallel aggregation; the window touches #distinct-values rows. */
  val q26Median: Q = (s, dir) => {
    val hist = table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("l_returnflag"))
    hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("target", floor((sum(col("cnt")).over(tot) + 1) / lit(2)))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("cnt") < col("target"))
      .select(col("l_returnflag"), col("l_quantity").as("median_qty"))
  }

  /** Rolling regression slope (the BETA-family indicator COVERAGE.md
    * lists as a gap — same math as rolling β, with the per-user event
    * INDEX as the reference series): per-user 10-row frame, least-squares
    * slope of value per event step from decimal-exact power sums.
    *
    * Numerics: the abscissa is `row_number` (small exact ints), NOT epoch
    * time — with raw epoch seconds x² ≈ 3·10¹⁸, `n·Σx² − (Σx)²` cancels
    * below double precision and the slope is rounding noise. Index sums
    * stay ≤ 10⁹, every product is computed decimal×decimal (no
    * double-product-then-round step, which the two engines round
    * differently), so the slope is bit-identical and numerically sane.
    * Both window passes share one partition+order spec — one sort.
    * Degenerate frames (zero index variance) are NULL in both engines. */
  val qi2RollingTrend: Q = (s, dir) => {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val w = wo.rowsBetween(-9, 0)
    val xd = col("rn").cast(DecimalType(18, 0))
    val yd = col("value").cast(DecimalType(18, 6))
    def sd(c: Column): Column = sum(c).over(w).cast("double")
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(wo))
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sd(xd)).withColumn("sy", sd(yd))
      .withColumn("sxx", sd(xd * xd)).withColumn("sxy", sd(xd * yd))
      .withColumn("trend",
        when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("trend"))
  }

  /** Z-order cell aggregation — the bit-interleaved Morton key from
    * [[graft.sources.ZOrder.interleave]] used as a first-class VALUE, not
    * just a write-side sort key: lineitem bucketed on (l_partkey,
    * l_suppkey) low bytes, rolled up by 256-cell z-grid. The oracle SQL's
    * interleave expression is RENDERED from the same term loop
    * ([[ZOrder.sqlInterleave]]), so the hash check proves the bit layout
    * itself, not just the aggregation — the cross-engine complement to
    * `ZOrderSpec`'s driver-reference weave check. The key is pure
    * shift/and/add integer arithmetic — whole-stage codegen, no UDF. */
  val q43ZOrder: Q = (s, dir) => {
    val z = ZOrder.interleave(
      Seq(pmod(col("l_partkey"), lit(256)), pmod(col("l_suppkey"), lit(256))),
      bits = 8)
    table(s, dir, "lineitem")
      .withColumn("zcell", shiftright(z, 8))
      .groupBy(col("zcell"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** Hilbert-curve cell aggregation — q43's twin on the CONTINUOUS
    * space-filling curve: lineitem bucketed on (l_partkey, l_suppkey)
    * low bytes, Hilbert index via the native codegen'd
    * [[graft.functions.HilbertIndex2]] expression (the iterative
    * flip-and-swap bit descent that would blow up ~3^bits as
    * declarative Columns), rolled up by 256-cell curve segment. The
    * oracle UNROLLS the same loop as a generated CTE chain
    * ([[ZOrder.sqlHilbertCte]]) — the hash match proves every level's
    * rotation arithmetic cross-engine. */
  val q45Hilbert: Q = (s, dir) => {
    val h = ZOrder.hilbertValue(
      pmod(col("l_partkey"), lit(256)), pmod(col("l_suppkey"), lit(256)),
      bits = 8)
    table(s, dir, "lineitem")
      .withColumn("hcell", shiftright(h, 8))
      .groupBy(col("hcell"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** The whole layout-and-skipping read path, oracle-checked end to
    * end: lineitem rewritten z-ordered into a temp lake, stats-indexed
    * ([[graft.sources.StatsIndex]]), then a 2-D box read through
    * `readPruned` — FILE-level pruning from the index, row-group
    * pruning from the pushed filter, exact predicate re-applied — and
    * aggregated. The oracle is the PLAIN filtered aggregate over the
    * original table: the hash match proves write → index → prune →
    * filter loses and fabricates nothing (conservative pruning made a
    * driver-gate guarantee, the batch complement of qs14). */
  /** Temp workspace for the layout queries (q46/q47/q50/q51): each
    * run writes a full clustered copy of lineitem plus an index, so
    * repeated bench rounds would leak disk without cleanup — all
    * workspaces are deleted at JVM exit (ADVICE r5). ONE statically-
    * registered hook drains the shared queue: per-call hooks would
    * accumulate a thread per query invocation (bench reps, suites)
    * and run in unspecified concurrent order at exit. */
  private val tempWorkDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rec(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rec)
        f.delete(); ()
      }
      var p = tempWorkDirs.poll()
      while (p != null) {
        try rec(p.toFile) catch { case _: Throwable => () }
        p = tempWorkDirs.poll()
      }
    }, "graft-layout-temp-cleanup"))
  }
  private[queries] def tempWork(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(tag)
    tempWorkDirs.add(p)
    p.toString
  }

  val q46PrunedScan: Q = (s, dir) => {
    val work = tempWork("graft_q46_")
    ZOrder.write(table(s, dir, "lineitem"), s"$work/lake",
      Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
    graft.sources.StatsIndex.build(s, s"$work/lake",
      Seq("l_partkey", "l_suppkey"), s"$work/idx")
    graft.sources.StatsIndex.readPruned(s, s"$work/lake", s"$work/idx",
      Seq(("l_partkey", 100L, 600L), ("l_suppkey", 10L, 60L)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** TYPED file-level skipping, oracle-checked end to end: lineitem
    * rewritten range-clustered on its DOUBLE price column
    * ([[graft.sources.PartitionedLake.writeClustered]]), stats-indexed,
    * then read through `readPrunedTyped` with a fractional double box,
    * a timestamp window and a string range — the three column classes
    * v1 could not prune at all (they covered 59 of the reference's 60
    * columns). The oracle is the PLAIN filtered aggregate: the hash
    * match proves typed pruning (ulp-widened double bounds, unit-
    * normalized timestamp micros, truncation-safe string bounds) loses
    * and fabricates nothing. */
  val q47TypedPrunedScan: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q47_")
    graft.sources.PartitionedLake.writeClustered(
      table(s, dir, "lineitem"), s"$work/lake",
      Seq("l_extendedprice"), numFiles = 8)
    StatsIndex.build(s, s"$work/lake",
      Seq("l_extendedprice", "l_shipdate", "l_returnflag"), s"$work/idx")
    StatsIndex.readPrunedTyped(s, s"$work/lake", s"$work/idx", Seq(
      StatsIndex.DoubleRange("l_extendedprice", 10000.5, 30000.25),
      StatsIndex.TimestampRange("l_shipdate",
        java.time.Instant.parse("1993-01-01T00:00:00Z"),
        java.time.Instant.parse("1996-06-30T23:59:59Z")),
      StatsIndex.StringRange("l_returnflag", "A", "N")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** Bloom-arm file skipping, oracle-checked end to end: lineitem
    * z-ordered on (partkey, suppkey) — so every file spans nearly the
    * full `l_orderkey` range and min/max stats CANNOT prune an
    * orderkey point probe — then stats-indexed with a per-file Bloom
    * sidecar on `l_orderkey` and read through a [[graft.sources
    * .StatsIndex.LongEquals]] probe. The oracle is the plain filtered
    * aggregate: the hash match proves the bloom arm (xxhash64-symmetric
    * build/probe, int-widening, translation join) loses and fabricates
    * nothing; a false positive merely keeps an extra file. */
  val q50BloomPrunedScan: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q50_")
    ZOrder.write(table(s, dir, "lineitem"), s"$work/lake",
      Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
    StatsIndex.build(s, s"$work/lake", Seq("l_partkey"), s"$work/idx",
      bloomCols = Seq("l_orderkey"), bloomItems = 100000,
      bloomFpp = 0.001)
    StatsIndex.readPrunedTyped(s, s"$work/lake", s"$work/idx",
      Seq(StatsIndex.LongEquals("l_orderkey", 1L)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** DOUBLE-point bloom skipping, oracle-checked end to end (r5
    * VERDICT ask #7): lineitem z-ordered on (partkey, suppkey) — so
    * every file spans nearly the full price range and min/max stats
    * CANNOT prune a price point probe — then stats-indexed with a
    * per-file double bloom sidecar on `l_extendedprice` and read
    * through a [[graft.sources.StatsIndex.DoubleEquals]] probe. The
    * probe value comes from the data itself (the first line of the
    * smallest order — a bounded TakeOrdered single-row collect) so
    * the query is scale-factor independent; the oracle recomputes it
    * as a scalar subquery. The
    * hash match proves the double arm (bit-symmetric xxhash64 on the
    * widened double, ±0.0/NaN guards, min/max degenerate range)
    * loses and fabricates nothing. */
  val q51DoubleBloomScan: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q51_")
    val li = table(s, dir, "lineitem")
    val v = li
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_extendedprice")).head.getDouble(0)
    ZOrder.write(li, s"$work/lake", Seq("l_partkey", "l_suppkey"),
      bits = 10, numFiles = 8)
    StatsIndex.build(s, s"$work/lake", Seq("l_partkey"), s"$work/idx",
      bloomCols = Seq("l_extendedprice"), bloomItems = 100000,
      bloomFpp = 0.001)
    StatsIndex.readPrunedTyped(s, s"$work/lake", s"$work/idx",
      Seq(StatsIndex.DoubleEquals("l_extendedprice", v)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
  }

  /** TIMESTAMP-flavored file skipping, oracle-checked end to end:
    * events time-clustered into a temp lake, stats-indexed — the `ts`
    * column is TIMESTAMP_NTZ, so its stats rows carry the `tsntz`
    * kind with the ±14 h session-offset slack — then read through a
    * [[graft.sources.StatsIndex.TimestampRange]] probe and
    * aggregated. The oracle is the plain filtered aggregate: the hash
    * match proves the wall-clock arm (micros normalization + offset
    * slack) loses and fabricates nothing on the one table whose
    * physical timestamp encoding has already drifted once between
    * rounds. */
  val q52TsPrunedScan: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q52_")
    graft.sources.PartitionedLake.writeClustered(
      Oracle.events(s, dir), s"$work/lake", Seq("ts"), numFiles = 8)
    StatsIndex.build(s, s"$work/lake", Seq("ts"), s"$work/idx")
    StatsIndex.readPrunedTyped(s, s"$work/lake", s"$work/idx", Seq(
      StatsIndex.TimestampRange("ts",
        java.time.Instant.parse("2024-01-10T00:00:00Z"),
        java.time.Instant.parse("2024-01-14T23:59:59Z"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
  }

  /** TIMESTAMP point-probe BLOOM skipping, oracle-checked end to end
    * (r6 VERDICT ask #5): events z-ordered by (user_id, event_id) — a
    * lake NOT clustered by time, so every file spans nearly the full
    * ts range and the min/max arms (even q52's exact ones) cannot
    * prune a ts point probe — then stats-indexed WITH a per-file
    * timestamp bloom sidecar and read through a
    * [[graft.sources.StatsIndex.TimestampEquals]] probe. The ts
    * column is TIMESTAMP_NTZ ([[Oracle.events]] normalizes every
    * physical encoding to it), so the bloom rows carry the `tswall`
    * space and the probe hashes the wall-clock its instant denotes
    * under the session zone — the hash match proves that round trip
    * (NTZ-to-NTZ wall diff at build, instant→wall inversion at probe)
    * loses and fabricates nothing. The probe value comes from the
    * data itself (ts of the smallest event_id — a bounded
    * TakeOrdered single-row collect) so the query is scale-factor
    * independent; the oracle recomputes it as a scalar subquery. */
  val q53TsBloomScan: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q53_")
    val ev = Oracle.events(s, dir)
    val wall = ev.orderBy(col("event_id"))
      .select(col("ts")).head.getAs[java.time.LocalDateTime](0)
    val zone = java.time.ZoneId.of(s.conf.get("spark.sql.session.timeZone"))
    ZOrder.write(ev, s"$work/lake", Seq("user_id", "event_id"),
      bits = 10, numFiles = 8)
    StatsIndex.build(s, s"$work/lake", Seq("user_id"), s"$work/idx",
      bloomCols = Seq("ts"), bloomItems = 200000, bloomFpp = 0.001)
    StatsIndex.readPrunedTyped(s, s"$work/lake", s"$work/idx", Seq(
      StatsIndex.TimestampEquals("ts", wall.atZone(zone).toInstant)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
  }

  /** The commit-log fixture q54/q55 share: lineitem ingested into a
    * logged lake as three committed batches (split `l_orderkey % 3`),
    * plus a fourth batch's files written but NEVER committed — a
    * crashed ingest's orphans. Returns the lake dir. */
  private[queries] def loggedLake(s: SparkSession, dir: String,
      work: String): String = {
    import graft.sources.CommitLog
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val li = table(s, dir, "lineitem")
    // the four writes (3 committed batches + the orphan) are
    // independent jobs — stage them CONCURRENTLY so each job's tail
    // back-fills the others' idle cores (guide §2.6), then publish
    // the commits sequentially with exact per-batch file attribution
    // (the staged listing IS batch b's file set — no before/after
    // diff). Resulting lake state is byte-identical in content to the
    // sequential build: same rows per batch id, same orphans.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val staged = (0 to 3).map { b =>
        scala.concurrent.Future {
          val df =
            if (b <= 2) li.filter(pmod(col("l_orderkey"), lit(3)) === b)
            // crashed batch 3: its files land, its commit never does
            else li.filter(pmod(col("l_orderkey"), lit(3)) === 0)
              .limit(1000)
          df.write.parquet(s"$work/stage$b")
          fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/stage$b"))
            .map(_.getPath.getName)
            .filter(n => !n.startsWith("_") && !n.startsWith("."))
            .sorted.toSeq
        }(ec)
      }
      fs.mkdirs(new org.apache.hadoop.fs.Path(lake))
      staged.zipWithIndex.foreach { case (fut, b) =>
        val names = scala.concurrent.Await.result(fut,
          scala.concurrent.duration.Duration.Inf)
        names.foreach { n =>
          // loud on failure (ADVICE r14): a silently failed rename
          // would commit a file name the lake dir doesn't hold
          require(fs.rename(
            new org.apache.hadoop.fs.Path(s"$work/stage$b/$n"),
            new org.apache.hadoop.fs.Path(s"$lake/$n")),
            s"loggedLake: staging rename failed for $n")
        }
        if (b <= 2) CommitLog.commit(fs, lake, b, names)
      }
    } finally pool.shutdown()
    lake
  }

  /** TIME TRAVEL over the commit log, oracle-checked end to end: the
    * [[loggedLake]] fixture read AS OF batch 1 —
    * [[graft.streaming.LayoutSink.readCommittedAt]] plans ONLY the
    * manifest-listed files of batches ≤ 1, no directory scan — then
    * aggregated. The oracle filters lineitem to the same two
    * congruence classes: the hash match proves the as-of view carries
    * batches 0–1 exactly, with batch 2's committed files and the
    * crash orphans both invisible. At 100 TB this is the Delta/Iceberg
    * reproducibility primitive: a training run pins `asOf` and reads a
    * byte-stable snapshot while ingest keeps appending. */
  val q54TimeTravel: Q = (s, dir) => {
    val lake = loggedLake(s, dir, tempWork("graft_q54_"))
    graft.streaming.LayoutSink.readCommittedAt(s, lake, asOf = 1L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** VACUUM, oracle-checked end to end through a PLAIN directory read:
    * the [[loggedLake]] fixture after [[graft.sources.CommitLog
    * .vacuum]] (horizon 0 — no writer is mid-batch here). The
    * directory read must now equal the committed view, i.e. all of
    * lineitem: the hash match proves vacuum swept ALL orphans (a
    * leftover would double-count its rows) and ONLY orphans (a deleted
    * committed file would drop rows). The age gate that protects an
    * in-flight writer's fresh files is spec-tested in
    * TimeTravelVacuumSpec. */
  val q55Vacuum: Q = (s, dir) => {
    import graft.sources.CommitLog
    val lake = loggedLake(s, dir, tempWork("graft_q55_"))
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    CommitLog.vacuum(fs, lake, olderThanMs = 0L)
    s.read.parquet(lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** INCREMENTAL (CDC-style) read over the commit log, oracle-checked
    * end to end: the [[loggedLake]] fixture read as "the delta after
    * batch 0, up to batch 2" — [[graft.streaming.LayoutSink
    * .readChanges]] plans ONLY the files batches 1–2 added; batch 0
    * and the crash orphans are invisible. The consume loop an
    * incremental 100 TB pipeline runs: remember the last batch id
    * processed, read the delta, advance — no directory diffing, no
    * full-table rescan. The oracle filters lineitem to the matching
    * congruence classes. */
  val q56ReadChanges: Q = (s, dir) => {
    val lake = loggedLake(s, dir, tempWork("graft_q56_"))
    graft.streaming.LayoutSink.readChanges(s, lake,
      fromExclusive = 0L, toInclusive = 2L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** Copy-on-write MERGE INTO, oracle-checked end to end: the
    * [[loggedLake]] fixture upserted with (a) every `l_orderkey % 7
    * == 0` row at quantity + 100 (whenMatched update) and (b) every
    * `l_orderkey % 11 == 3` row re-keyed to a negated order key at
    * quantity + 0.5 (whenNotMatched insert), then the committed view
    * aggregated. The oracle computes the same merged table as a
    * CASE + UNION ALL over lineitem: the hash match proves matched
    * rows were replaced exactly once, inserts landed exactly once,
    * untouched rows are byte-identical, and the crash orphans stayed
    * invisible through the checkpoint swap. */
  val q57MergeUpsert: Q = (s, dir) => {
    import graft.sources.MergeInto
    val lake = loggedLake(s, dir, tempWork("graft_q57_"))
    val li = table(s, dir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val upd = li.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    val ins = li.filter(col("l_orderkey") % 11 === 3)
      .withColumn("l_orderkey", -col("l_orderkey"))
      .withColumn("l_quantity", col("l_quantity") + 0.5)
    MergeInto.merge(s, lake, upd.unionByName(ins), keys)
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
  }

  /** The FULL `MERGE INTO` clause grammar
    * ([[graft.sources.MergeInto.mergeClauses]]), oracle-checked end to
    * end over the [[loggedLake]] fixture: a conditional
    * `WHEN MATCHED AND t.l_returnflag = 'R' THEN DELETE`, a
    * fallthrough `WHEN MATCHED THEN UPDATE SET l_quantity =
    * s.l_quantity` (source carries quantity + 50), a conditional
    * `WHEN NOT MATCHED AND s.l_quantity > 25 THEN INSERT *` over
    * re-keyed rows, and a `WHEN NOT MATCHED BY SOURCE AND
    * t.l_linestatus = 'O' THEN UPDATE SET l_discount = 0.99`. The
    * oracle rebuilds the same table as CASE + complement-filter +
    * UNION ALL over lineitem: the hash match proves clause order
    * (delete shadows the fallthrough update for 'R' rows), exact
    * once-each application, by-source updates reaching ONLY
    * not-matched rows, the failed insert condition dropping rows, and
    * untouched rows carrying byte-identically. */
  val q87MergeClauses: Q = (s, dir) => {
    import graft.sources.MergeInto
    import graft.sources.MergeInto.{BySourceUpdate, MatchedDelete,
      MatchedUpdate, NotMatchedInsert}
    val lake = loggedLake(s, dir, tempWork("graft_q87_"))
    val li = table(s, dir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val src = li.filter(col("l_orderkey") % 5 === 0)
      .withColumn("l_quantity", col("l_quantity") + 50)
      .unionByName(li.filter(col("l_orderkey") % 13 === 1)
        .withColumn("l_orderkey", -col("l_orderkey")))
    MergeInto.mergeClauses(s, lake, src, keys,
      matched = Seq(
        MatchedDelete(Some("t.l_returnflag = 'R'")),
        MatchedUpdate(Map("l_quantity" -> "s.l_quantity"))),
      notMatched = Seq(
        NotMatchedInsert(condition = Some("s.l_quantity > 25"))),
      notMatchedBySource = Seq(
        BySourceUpdate(Map("l_discount" -> "0.99"),
          Some("t.l_linestatus = 'O'"))))
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_discount")).as("sum_disc"))
  }

  /** q87's MERGE-ON-READ twin
    * ([[graft.sources.DeletionVectors.mergeClausesMor]]): the SAME
    * clause program — conditional matched DELETE shadowing a
    * fallthrough UPDATE, conditional INSERT *, by-source UPDATE —
    * executed with zero file rewrites: claimed rows DV-marked,
    * post-images and inserts appended as delta files, one checkpoint.
    * The in-query require pins that every base file survived; the
    * oracle is IDENTICAL to q87's — the hash match proves the MoR
    * execution lands the exact CoW answer. */
  val q90MergeClausesMor: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, MergeInto}
    import graft.sources.MergeInto.{BySourceUpdate, MatchedDelete,
      MatchedUpdate, NotMatchedInsert}
    val lake = loggedLake(s, dir, tempWork("graft_q90_"))
    val fsq = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val li = table(s, dir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val src = li.filter(col("l_orderkey") % 5 === 0)
      .withColumn("l_quantity", col("l_quantity") + 50)
      .unionByName(li.filter(col("l_orderkey") % 13 === 1)
        .withColumn("l_orderkey", -col("l_orderkey")))
    val base = CommitLog.committedNames(fsq, lake)
    DeletionVectors.mergeClausesMor(s, lake, src, keys,
      matched = Seq(
        MatchedDelete(Some("t.l_returnflag = 'R'")),
        MatchedUpdate(Map("l_quantity" -> "s.l_quantity"))),
      notMatched = Seq(
        NotMatchedInsert(condition = Some("s.l_quantity > 25"))),
      notMatchedBySource = Seq(
        BySourceUpdate(Map("l_discount" -> "0.99"),
          Some("t.l_linestatus = 'O'"))))
    require(base.subsetOf(CommitLog.committedNames(fsq, lake)),
      "q90: a merge-on-read clause merge must rewrite nothing")
    DeletionVectors.readMor(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_discount")).as("sum_disc"))
  }

  /** The FULL clause grammar under OPTIMISTIC CONCURRENCY
    * ([[graft.sources.Occ.mergeClauses]] /
    * [[graft.sources.Occ.mergeClausesMor]]), oracle-checked end to
    * end with REAL interleaved writers in both windows. CoW lake:
    * q87's exact clause program runs with a blind append
    * (`l_orderkey % 17 = 3` rows) committed INSIDE its
    * prepare-to-commit window via the beforeCommit hook — appends
    * commute, so the merge must land WITHOUT a retry, carrying the
    * appended file untouched (the in-query require pins exactly one
    * attempt). MoR lake: the same program runs with a conflicting
    * MoR delete (`l_orderkey % 19 = 4`) landing inside its window —
    * ANY interleaved commit conflicts under the MoR rule, so the
    * merge must retry EXACTLY once and re-evaluate its clauses on
    * the post-delete live view (source rows whose only key row died
    * become inserts; the oracle's third branch). The hash match
    * proves both OCC executions land the declarative end state —
    * no lost append, no lost update, no double-applied clause. */
  val q91OccMergeClauses: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, Occ}
    import graft.sources.MergeInto.{BySourceUpdate, MatchedDelete,
      MatchedUpdate, NotMatchedInsert}
    val li = table(s, dir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val src = li.filter(col("l_orderkey") % 5 === 0)
      .withColumn("l_quantity", col("l_quantity") + 50)
      .unionByName(li.filter(col("l_orderkey") % 13 === 1)
        .withColumn("l_orderkey", -col("l_orderkey")))
    val matched = Seq(
      MatchedDelete(Some("t.l_returnflag = 'R'")),
      MatchedUpdate(Map("l_quantity" -> "s.l_quantity")))
    val notMatched = Seq(
      NotMatchedInsert(condition = Some("s.l_quantity > 25")))
    val bySource = Seq(
      BySourceUpdate(Map("l_discount" -> "0.99"),
        Some("t.l_linestatus = 'O'")))
    // the two arms mutate DISJOINT lakes and assert independent
    // counters — run them as concurrent driver jobs (guide §2.6: each
    // arm's many small jobs back-fill the other's stragglers and
    // driver gaps). Each arm's internal order — and therefore its
    // result — is exactly the sequential version's.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    val (lakeCow, lakeMor) = try {
      val cowArm = scala.concurrent.Future {
        // CoW arm: disjoint appender inside the window — zero retries
        val lakeCow = loggedLake(s, dir, tempWork("graft_q91c_"))
        val cowCalls = new java.util.concurrent.atomic.AtomicInteger(0)
        Occ.mergeClauses(s, lakeCow, src, keys, matched, notMatched,
          bySource, beforeCommit = () => {
            if (cowCalls.incrementAndGet() == 1)
              require(Occ.append(s, lakeCow,
                li.filter(col("l_orderkey") % 17 === 3)) > 0)
          })
        require(cowCalls.get() == 1,
          s"q91: an interleaved APPEND must not conflict a clause merge " +
            s"(${cowCalls.get()} attempts)")
        lakeCow
      }(ec)
      val morArm = scala.concurrent.Future {
        // MoR arm: conflicting delete inside the window — exactly 1 retry
        val lakeMor = loggedLake(s, dir, tempWork("graft_q91m_"))
        val morCalls = new java.util.concurrent.atomic.AtomicInteger(0)
        Occ.mergeClausesMor(s, lakeMor, src, keys, matched, notMatched,
          bySource, beforeCommit = () => {
            if (morCalls.incrementAndGet() == 1)
              require(Occ.deleteMor(s, lakeMor,
                "l_orderkey % 19 = 4") > 0)
          })
        require(morCalls.get() == 2,
          s"q91: an interleaved MUTATION must conflict a MoR clause " +
            s"merge exactly once (${morCalls.get()} attempts)")
        lakeMor
      }(ec)
      import scala.concurrent.duration.Duration
      (scala.concurrent.Await.result(cowArm, Duration.Inf),
        scala.concurrent.Await.result(morArm, Duration.Inf))
    } finally pool.shutdown()
    val agg = (df: org.apache.spark.sql.DataFrame, mode: String) => df
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_discount")).as("sum_disc"))
      .withColumn("mode", lit(mode))
    agg(graft.streaming.LayoutSink.readCommitted(s, lakeCow), "cow")
      .unionByName(agg(DeletionVectors.readMor(s, lakeMor), "mor"))
  }

  /** REORG … APPLY (PURGE) ([[graft.sources.ColumnMapping.purge]]),
    * oracle-checked end to end: `l_tax` is DROPped (metadata-only
    * tombstone), a MoR delete marks rows, a CLEAN batch (born
    * without the column) appends, then the
    * purge physically reclaims the dead bytes — in-query requires pin
    * that it rewrote the carrying files AND carried the clean one by
    * name, that no committed footer still advertises the column, and
    * that a post-purge append RECREATES the dropped name (the lifted
    * tombstone — rejected before purge, additive evolution after:
    * old rows read NULL). The final MoR aggregate folds all of it —
    * deleted rows absent, clean rows present, recreated values only
    * on the reborn batch — so a resurrected byte, lost row, or
    * half-lifted tombstone shifts the hash. */
  val q92ReorgPurge: Q = (s, dir) => {
    import graft.sources.{ColumnMapping, CommitLog, DeletionVectors, Occ}
    val lake = loggedLake(s, dir, tempWork("graft_q92_"))
    val fsq = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val li = table(s, dir, "lineitem")
    ColumnMapping.drop(s, lake, "l_tax")
    require(DeletionVectors.deleteMor(s, lake,
      "l_orderkey % 7 = 3") > 0L)
    // a clean batch, born without the dropped column — purge must
    // carry its file(s) by name
    require(Occ.append(s, lake,
      li.filter(col("l_orderkey") % 11 === 5).drop("l_tax")) > 0L)
    val (rewritten, carried) = ColumnMapping.purge(s, lake)
    require(rewritten > 0 && carried > 0,
      s"q92: purge must rewrite the carrying files and carry the " +
        s"clean one ($rewritten, $carried)")
    val committed = CommitLog.committedNames(fsq, lake).toSeq.sorted
    require(!s.read.option("mergeSchema", "true")
        .parquet(CommitLog.resolveDataPaths(fsq, lake, committed): _*)
        .columns.contains("l_tax"),
      "q92: a committed footer still advertises the purged column")
    // the tombstone lifted with the purge: the name is appendable again
    require(Occ.append(s, lake,
      li.filter(col("l_orderkey") % 13 === 1)
        .withColumn("l_tax", lit(9.99))) > 0L)
    DeletionVectors.readMor(s, lake, mergeSchema = true)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"),
        count(col("l_tax")).as("n_tax"))
  }

  /** STAGED purge under CONCURRENCY ([[graft.sources.ColumnMapping
    * .purge]], r14 — the probe+rewrite run UNLOCKED against a pinned
    * snapshot; only a metadata-scale commit section takes the writer
    * lock): two writers land BETWEEN the purge's prepare and its
    * commit, exercising both arms of the narrowed conflict rule in
    * one oracle-checked pass. A clean append COMMUTES (the purge
    * carries its file by name with no retry), while MoR-DELETE
    * vector churn on a carrying file IS a conflict (the staged
    * rewrite folded the OLD vector set — publishing it would
    * resurrect the deleted rows), so the purge re-prepares exactly
    * once; the in-query require pins the attempt count at 2. The
    * final MoR aggregate folds all three writers' effects — a lost
    * delete, a blocked append, a resurrected row, or a spurious
    * retry shifts the hash or trips the pin. */
  val q95PurgeStaged: Q = (s, dir) => {
    import graft.sources.{ColumnMapping, DeletionVectors, Occ}
    val lake = loggedLake(s, dir, tempWork("graft_q95_"))
    val li = table(s, dir, "lineitem")
    ColumnMapping.drop(s, lake, "l_tax")
    var attempts = 0
    val (rewritten, carried) = ColumnMapping.purge(s, lake,
      beforeCommit = () => {
        attempts += 1
        if (attempts == 1) {
          // clean append (born without the dropped column): commutes
          require(Occ.append(s, lake,
            li.filter(col("l_orderkey") % 11 === 5).drop("l_tax")) > 0L)
          // DV churn reaching the carrying files: a REAL conflict
          require(DeletionVectors.deleteMor(s, lake,
            "l_orderkey % 7 = 3") > 0L)
        }
      })
    require(attempts == 2,
      s"q95: the delete must cost exactly one retry and the append " +
        s"none — $attempts prepare attempts")
    require(rewritten > 0 && carried > 0,
      s"q95: purge accounting ($rewritten, $carried)")
    DeletionVectors.readMor(s, lake, mergeSchema = true)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
  }

  /** Metadata-first GROUPED COUNT
    * ([[graft.sources.StatsIndex.countByGroup]]), oracle-checked: the
    * documents corpus laid out lang-sharded (one file per language —
    * the layout a language-partitioned corpus lake has) plus ONE
    * deliberately MIXED tail file (every 5th doc of every language),
    * so the answer composes the zero-I/O arm (single-group files
    * contribute `(lang, row_count)` from footer stats alone) with the
    * boundary scan (only the mixed file is read and grouped). The
    * hash match against the plain DuckDB `GROUP BY` proves the
    * metadata arm counts exactly — the dashboard "count by partition"
    * shape that at 100 TB reads a handful of boundary files instead
    * of the corpus (`StatsIndexSpec` proves the zero-I/O claim by
    * DELETING the data under an all-interior lake). */
  val q93MetaGroupCount: Q = (s, dir) => {
    import graft.sources.StatsIndex
    import s.implicits._
    val work = tempWork("graft_q93_")
    val docs = table(s, dir, "documents")
    val langs = docs.select(col("lang")).distinct()
      .orderBy(col("lang")).as[String].collect()
    langs.foreach { l =>
      // null-safe shard predicate (ADVICE r13): `===` never matches a
      // NULL lang, so a corpus that gained NULL langs would silently
      // drop those docs from the lake and diverge from the oracle's
      // plain GROUP BY; `<=>` keeps the fixture oracle-equivalent
      docs.filter(col("lang") <=> l && col("doc_id") % 5 =!= 0)
        .coalesce(1).write.mode("append").parquet(s"$work/lake")
    }
    docs.filter(col("doc_id") % 5 === 0)
      .coalesce(1).write.mode("append").parquet(s"$work/lake")
    StatsIndex.build(s, s"$work/lake", Seq("lang"), s"$work/idx")
    StatsIndex.countByGroup(s, s"$work/lake", s"$work/idx", "lang")
      .select(col("lang"), col("n").as("n_docs"))
  }

  /** Metadata-first GROUPED MIN/MAX
    * ([[graft.sources.StatsIndex.minMaxByGroup]], r14 — the
    * metadata-answerable family's min/max member beside q93's count),
    * oracle-checked on the same lang-sharded layout: single-group
    * files serve their `n_chars` extrema straight from footer bounds
    * (exact for integral kinds — parquet stats exclude nulls, so
    * partial nullness costs nothing), only the deliberately MIXED
    * tail file scans, and the hash match against DuckDB's plain
    * `min/max GROUP BY` proves the bounds-as-extrema arm exact.
    * `StatsIndexSpec` proves the zero-I/O claim by deleting the data
    * and pins the DV discipline (a covered file always scans — a
    * dead row could be the extremum). */
  val q96MetaGroupMinmax: Q = (s, dir) => {
    import graft.sources.StatsIndex
    import s.implicits._
    val work = tempWork("graft_q96_")
    val docs = table(s, dir, "documents")
    val langs = docs.select(col("lang")).distinct()
      .orderBy(col("lang")).as[String].collect()
    langs.foreach { l =>
      docs.filter(col("lang") <=> l && col("doc_id") % 5 =!= 0)
        .coalesce(1).write.mode("append").parquet(s"$work/lake")
    }
    docs.filter(col("doc_id") % 5 === 0)
      .coalesce(1).write.mode("append").parquet(s"$work/lake")
    StatsIndex.build(s, s"$work/lake", Seq("lang", "n_chars"),
      s"$work/idx")
    StatsIndex.minMaxByGroup(s, s"$work/lake", s"$work/idx",
      "lang", "n_chars")
      .select(col("lang"), col("vmin").as("min_chars"),
        col("vmax").as("max_chars"))
  }

  /** Exact COUNT(DISTINCT) in the incrementally-maintained view
    * ([[graft.sources.IncrementalView]] `distinctCols`), oracle-checked:
    * the per-language view additionally maintains `nd_source` — the
    * distinct sources per language — via the refcount auxiliary (the
    * classic IVM shape: ±1 per (group, value) pair, a pair at 0
    * drops), which unlike min/max is fully DELETE-INVERTIBLE: the
    * delete, relabel-update and insert windows below all fold in with
    * NO group rescan, and the in-query require pins that the second
    * pass ran incrementally. The hash match against DuckDB's
    * `count(DISTINCT ...)` end state proves the refcounts track every
    * verb exactly — a leaked dead value or double-counted relabel
    * shifts nd_source. */
  val q94IncrViewDistinct: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, IncrementalView}
    val work = tempWork("graft_q94_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    docs.repartition(3).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    IncrementalView.refresh(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"), distinctCols = Seq("source"))
    DeletionVectors.deleteMor(s, lake, "doc_id % 10 = 4")
    DeletionVectors.updateMor(s, lake, "doc_id % 10 = 6",
      Map("source" -> "'relabeled'"))
    DeletionVectors.mergeMor(s, lake,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .withColumn("doc_id", -col("doc_id"))
        .withColumn("source", lit("minted")), Seq("doc_id"))
    val st = IncrementalView.refresh(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"), distinctCols = Seq("source"))
    require(st.mode == "incremental",
      s"q94: the second refresh must be incremental, was ${st.mode}")
    IncrementalView.readView(s, s"$work/view")
  }


  /** CHANGE DATA FEED ([[graft.sources.ChangeDataFeed]]),
    * oracle-checked end to end: batches 0–1 committed, the feed
    * enabled, then an UPDATE (`l_quantity += 5 WHERE l_returnflag =
    * 'R'`), a DELETE (`l_orderkey % 7 = 0`), and a fresh append of
    * batch 2. Reading `(Version(1,0), current]` must serve the
    * update's pre/post images at gen 1, the delete's images at gen 2
    * — reflecting the post-update values, because the delete ran on
    * the updated table — and batch 2's rows as gen-0 inserts, while
    * batches 0–1's insert segments stay outside the cursor. The
    * oracle rebuilds the same feed as a UNION ALL of filtered/CASEd
    * lineitem slices: the hash match proves row-level change capture,
    * version-key attribution, and mutation sequencing. */
  val q88ChangeFeed: Q = (s, dir) => {
    import graft.sources.{ChangeDataFeed, CommitLog, MergeInto}
    val lake = tempWork("graft_q88_") + "/lake"
    val fsq = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val li = table(s, dir, "lineitem")
    for (b <- 0 to 1) {
      val before = CommitLog.dataFileNames(fsq, lake)
      li.filter(pmod(col("l_orderkey"), lit(3)) === b)
        .write.mode("append").parquet(lake)
      CommitLog.commit(fsq, lake, b,
        (CommitLog.dataFileNames(fsq, lake) -- before).toSeq.sorted)
    }
    ChangeDataFeed.enable(s, lake)
    MergeInto.update(s, lake, "l_returnflag = 'R'",
      Map("l_quantity" -> "l_quantity + 5"))
    MergeInto.delete(s, lake, "l_orderkey % 7 = 0")
    val before2 = CommitLog.dataFileNames(fsq, lake)
    li.filter(pmod(col("l_orderkey"), lit(3)) === 2)
      .write.mode("append").parquet(lake)
    CommitLog.commit(fsq, lake, 2,
      (CommitLog.dataFileNames(fsq, lake) -- before2).toSeq.sorted)
    ChangeDataFeed.read(s, lake, ChangeDataFeed.Version(1, 0),
        ChangeDataFeed.currentVersion(s, lake))
      .groupBy(col("_change_type"), col("_commit_gen"),
        col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
  }

  /** Copy-on-write DELETE, oracle-checked end to end: the
    * [[loggedLake]] fixture with every pre-1995 shipment deleted,
    * then the committed view aggregated. Only files containing a
    * matching row are rewritten; the oracle is the complement
    * filter over lineitem — the hash match proves exactly the
    * matching rows vanished and everything else survived the
    * version swap bit-identically. */
  val q58Delete: Q = (s, dir) => {
    import graft.sources.MergeInto
    val lake = loggedLake(s, dir, tempWork("graft_q58_"))
    MergeInto.delete(s, lake,
      "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'")
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** Copy-on-write UPDATE, oracle-checked end to end: the
    * [[loggedLake]] fixture with `SET l_quantity = l_quantity + 5,
    * l_discount = l_discount * 0.5 WHERE l_returnflag = 'R'`, then the
    * committed view aggregated. Assignments read the PRE-update row
    * and non-matching rows — including those sharing a rewritten file
    * — pass through byte-identically; the oracle's CASE twin proves
    * both, and that the crash orphans stayed invisible through the
    * version swap. */
  val q60Update: Q = (s, dir) => {
    import graft.sources.MergeInto
    val lake = loggedLake(s, dir, tempWork("graft_q60_"))
    MergeInto.update(s, lake, "l_returnflag = 'R'", Map(
      "l_quantity" -> "l_quantity + 5",
      "l_discount" -> "l_discount * 0.5"))
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_discount")).as("sum_disc"))
  }

  /** Additive SCHEMA EVOLUTION through merge, oracle-checked end to
    * end: the [[loggedLake]] fixture merged with updates that carry a
    * NEW `l_bonus` column (every `l_orderkey % 7 == 0` row,
    * `evolveSchema = true`), then read back with `mergeSchema = true`
    * and aggregated over `coalesce(l_bonus, 0)`. Carried files keep
    * their old physical schema (zero I/O) and their rows read NULL in
    * the new column — the oracle's CASE over lineitem computes the
    * same backfill: the hash match proves evolution changed exactly
    * the updated rows' new column and nothing else anywhere. */
  val q59SchemaEvolution: Q = (s, dir) => {
    import graft.sources.MergeInto
    val lake = loggedLake(s, dir, tempWork("graft_q59_"))
    val li = table(s, dir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val upd = li.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_bonus", col("l_quantity") * 0.1)
    MergeInto.merge(s, lake, upd, keys, evolveSchema = true)
    graft.streaming.LayoutSink.readCommitted(s, lake, mergeSchema = true)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(coalesce(col("l_bonus"), lit(0.0))).as("sum_bonus"))
  }

  /** ORC source/sink round-trip, oracle-checked:
    * [[graft.sources.OrcRoundTrip]] (previously spec-only) rewrites
    * lineitem as ORC, reads it back with a pushed filter and
    * aggregates. The oracle runs the same filtered aggregate on the
    * parquet twin: the hash match proves the ORC writer/reader
    * round-trips every value class the query touches (decimal-summed
    * double, string, date-derived timestamp) bit-exactly. */
  val qo1Orc: Q = (s, dir) => {
    import graft.sources.OrcRoundTrip
    val work = tempWork("graft_qo1_")
    OrcRoundTrip.write(table(s, dir, "lineitem"), s"$work/orc")
    OrcRoundTrip.read(s, s"$work/orc")
      .filter(col("l_quantity") >= 25)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"),
        max(col("l_shipdate")).as("max_ship"))
  }

  /** Metadata-first COUNT, oracle-checked end to end: lineitem
    * z-ordered on (partkey, suppkey), stats-indexed, then a 2-D box
    * COUNT through [[graft.sources.StatsIndex.countPruned]] —
    * interior files (stats prove every row inside the box, zero
    * nulls) contribute their footer row_count with ZERO data I/O,
    * only the boundary shell is scanned and exactly filtered. The
    * oracle is the plain filtered COUNT: the hash match proves the
    * containment algebra (z-order makes most surviving files
    * interior) counts exactly — not an estimate. At 100 TB this is
    * the Iceberg metadata-count: a selective COUNT reads a handful of
    * boundary files instead of the table. */
  val q61MetaCount: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q61_")
    ZOrder.write(table(s, dir, "lineitem"), s"$work/lake",
      Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
    StatsIndex.build(s, s"$work/lake", Seq("l_partkey", "l_suppkey"),
      s"$work/idx")
    val n = StatsIndex.countPruned(s, s"$work/lake", s"$work/idx",
      Seq(StatsIndex.LongRange("l_partkey", 100L, 1500L),
        StatsIndex.LongRange("l_suppkey", 5L, 90L)))
    import s.implicits._
    Seq(n).toDF("n")
  }

  /** Dynamic file pruning, oracle-checked end to end: lineitem
    * z-ordered on (partkey, suppkey) and stats-indexed with a partkey
    * bloom sidecar, then joined to a SELECTIVE slice of `part`
    * through [[graft.sources.StatsIndex.dfpJoin]] — the dim side's
    * distinct keys are collected (bounded, the file-skipping analog
    * of the broadcast threshold), the fact lake's files pruned to
    * those that can contain AT LEAST ONE key (min/max + bloom arms,
    * one metadata-scale two-level aggregation — never a k-wide
    * expression), and only the survivors scanned into the join. The
    * oracle is the plain filtered join: the hash match proves
    * disjunctive pruning loses no matching fact row and the join
    * fabricates nothing. The dim filter keeps a NARROW partkey band,
    * so on the z-ordered lake the prune genuinely skips files — the
    * 100 TB shape where a selective dim join reads a handful of fact
    * files instead of the table (`StatsIndexSpec` asserts the skip
    * count; correctness never depends on it). */
  val q62DfpJoin: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q62_")
    ZOrder.write(table(s, dir, "lineitem"), s"$work/lake",
      Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
    StatsIndex.build(s, s"$work/lake", Seq("l_partkey"), s"$work/idx",
      bloomCols = Seq("l_partkey"), bloomItems = 100000,
      bloomFpp = 0.001)
    val dim = table(s, dir, "part")
      .filter(col("p_partkey").between(50, 120) && col("p_size") <= 25)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    StatsIndex.dfpJoin(s, s"$work/lake", s"$work/idx", "l_partkey",
      broadcast(dim), "p_partkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"),
        sumd(col("p_retailprice")).as("sum_retail"))
  }

  /** Metadata-first MIN/MAX, oracle-checked end to end: lineitem
    * written into a clustered lake, stats-indexed, then global
    * min/max of a long and two double columns answered by
    * [[graft.sources.StatsIndex.minMaxPruned]] from the index's
    * per-file bounds ALONE — long footer bounds are exact values and
    * the build's one-ulp-outward double widening is inverted
    * bit-exactly (`nextUp∘nextDown = id` on finite doubles), so with
    * no gap files the answer involves ZERO data I/O. The oracle is
    * the plain full-scan aggregate: the hash match proves the
    * recovered bounds are the true extrema to the bit, not
    * metadata-shaped approximations. */
  val q63MetaMinmax: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q63_")
    ZOrder.write(table(s, dir, "lineitem"), s"$work/lake",
      Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
    StatsIndex.build(s, s"$work/lake",
      Seq("l_orderkey", "l_extendedprice", "l_quantity"), s"$work/idx")
    StatsIndex.minMaxPruned(s, s"$work/lake", s"$work/idx",
      Seq("l_orderkey", "l_extendedprice", "l_quantity"))
  }

  /** The string-keyed doc lake q64/q68 share: `documents` projected to
    * (doc_key, lang, n_chars), split `doc_id % 3` into 3 committed
    * batches — a SHUFFLED layout, so only the bloom arm can prune
    * string point keys — and bloom-indexed on `doc_key`. Returns
    * (lakeDir, indexDir) plus the keyed projection helper. */
  private def docKeyLake(s: SparkSession, dir: String, work: String)
      : (String, String,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    import graft.sources.{CommitLog, StatsIndex}
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select(
      concat(lit("doc-"),
        lpad(col("doc_id").cast("string"), 8, "0")).as("doc_key"),
      col("lang"), col("n_chars"))
    val docs = table(s, dir, "documents")
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(fs, lake)
      keyed(docs.filter(pmod(col("doc_id"), lit(3)) === b))
        .write.mode("append").parquet(lake)
      CommitLog.commit(fs, lake, b,
        (CommitLog.dataFileNames(fs, lake) -- before).toSeq.sorted)
    }
    StatsIndex.build(s, lake, Seq("doc_key"), s"$work/idx",
      bloomCols = Seq("doc_key"), bloomItems = 100000, bloomFpp = 0.001)
    (lake, s"$work/idx", keyed)
  }

  /** STRING-keyed MERGE with index-assisted discovery, oracle-checked
    * end to end (r7 VERDICT ask #3): a commit-logged doc lake keyed by
    * a string `doc_key` (the natural key of an LLM corpus — min/max
    * stats on a shuffled layout can't prune it, so the lake is
    * bloom-indexed on the key), then upserted through
    * [[graft.sources.MergeInto.merge]] with `indexDir` set: touched-
    * file discovery runs [[graft.sources.StatsIndex
    * .prunedForKeysString]] — the string bloom arm — instead of
    * scanning every file's key column. Updates bump every
    * `doc_id % 97 == 0` doc's length (whenMatched replace); inserts
    * add a `new-` keyed row per `doc_id % 101 == 5` doc
    * (whenNotMatched). The oracle computes the same merged corpus as
    * CASE + UNION ALL over `documents`: the hash match proves
    * string-key discovery lost no matched file (a missed file would
    * leave a stale row and shift the sums) and the checkpoint swap
    * stayed exact. MergeIntoSpec asserts the candidate-set ⊇ touched
    * contract directly. */
  val q64MergeStringKey: Q = (s, dir) => {
    import graft.sources.MergeInto
    val (lake, idx, keyed) = docKeyLake(s, dir, tempWork("graft_q64_"))
    val docs = table(s, dir, "documents")
    val upd = keyed(docs.filter(pmod(col("doc_id"), lit(97)) === 0))
      .withColumn("n_chars", col("n_chars") + 1000)
    val ins = keyed(docs.filter(pmod(col("doc_id"), lit(101)) === 5))
      .withColumn("doc_key",
        concat(lit("new-"), col("doc_key")))
      .withColumn("n_chars", col("n_chars") + 7)
    MergeInto.merge(s, lake, upd.unionByName(ins), Seq("doc_key"),
      indexDir = Some(idx))
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  /** IN-list file skipping on the READ path, oracle-checked end to
    * end (r7 VERDICT ask #8): real dashboards probe key SETS, not
    * single points — lineitem range-clustered on `l_orderkey`,
    * stats-indexed, then a 100-key `isin` scan through
    * [[graft.sources.StatsIndex.readPrunedForKeys]]: one
    * metadata-scale two-level aggregation keeps only the files that
    * can hold AT LEAST ONE key, the exact `isin` filter decides. The
    * oracle is the plain `IN`-list aggregate: the hash match proves
    * disjunctive read-path pruning loses and fabricates nothing. On
    * the clustered layout the 100-key band lives in one file of 8 —
    * the 100 TB shape where a dashboard's key-set probe reads a
    * handful of files instead of the table. */
  val q65InlistScan: Q = (s, dir) => {
    import graft.sources.StatsIndex
    val work = tempWork("graft_q65_")
    graft.sources.PartitionedLake.writeClustered(
      table(s, dir, "lineitem"), s"$work/lake", Seq("l_orderkey"),
      numFiles = 8)
    StatsIndex.build(s, s"$work/lake", Seq("l_orderkey"), s"$work/idx")
    val keys = inlistKeys
    StatsIndex.readPrunedForKeys(s, s"$work/lake", s"$work/idx",
      "l_orderkey", keys)
      .filter(col("l_orderkey").isin(keys: _*))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }
  /** The q65 probe set: 100 keys in a narrow band — selective against
    * any SF's orderkey range, shared with the oracle SQL. */
  private val inlistKeys: Seq[Long] = (1 to 100).map(_.toLong * 29L)

  /** Index-assisted PREDICATE mutation, oracle-checked end to end
    * (r8): a retention DELETE of a closed shipping window on a
    * TIME-CLUSTERED committed lake with the `impliedRanges` discovery
    * hint, so touched-file discovery scans only the files the index
    * says can hold expiring rows (the expiring band), not every
    * file's predicate column. The hint's IMPLICATION is airtight by
    * construction: the predicate is `lo <= l_shipdate < hi` and the
    * range endpoints are THE SAME literals parsed by THE SAME session
    * (so a non-UTC session shifts predicate and hint identically —
    * never a band the hint misses), with the range's inclusive upper
    * covering the predicate's exclusive one. The 100 TB shape of a
    * retention sweep: on a time-clustered lake the band is a few
    * files; everything else is carried by name with zero I/O and
    * never even scanned for discovery. The oracle is the complement
    * filter over lineitem: the hash match proves pruned discovery
    * missed no matching file (a missed file would leave deleted rows
    * alive and shift the sums). */
  val q66DeletePruned: Q = (s, dir) => {
    import graft.sources.{CommitLog, MergeInto, StatsIndex}
    val work = tempWork("graft_q66_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    table(s, dir, "lineitem")
      .repartitionByRange(6, col("l_shipdate")).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    StatsIndex.build(s, lake, Seq("l_shipdate"), s"$work/idx")
    val (loLit, hiLit) = ("1995-01-01 00:00:00", "1997-01-01 00:00:00")
    // the instants the PROBE session's parse of those literals denotes
    def parsed(ts: String): java.time.Instant = {
      val micros = s.sql(s"SELECT unix_micros(TIMESTAMP '$ts') AS m")
        .head.getLong(0)
      java.time.Instant.EPOCH.plusNanos(micros * 1000L)
    }
    MergeInto.delete(s, lake,
      s"l_shipdate >= TIMESTAMP '$loLit' AND " +
        s"l_shipdate < TIMESTAMP '$hiLit'",
      indexDir = Some(s"$work/idx"),
      impliedRanges = Seq(StatsIndex.TimestampRange("l_shipdate",
        parsed(loLit), parsed(hiLit))))
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** MERGE-ON-READ delete via DELETION VECTORS, oracle-checked end to
    * end (r8): the [[loggedLake]] fixture (3 committed batches +
    * crash orphans) with every `l_orderkey % 7 == 0` row deleted by
    * [[graft.sources.DeletionVectors.deleteMor]] — ZERO data files
    * rewritten; the delete is a tiny `(file, row position)` sidecar
    * plus a mutation checkpoint — then read through
    * [[graft.sources.DeletionVectors.readMor]] (committed view
    * anti-joined against the vectors on Spark's `_metadata.row_index`)
    * and aggregated. The oracle is the complement filter over
    * lineitem: the hash match proves position-based deletion removed
    * exactly the matching rows (a row_index off by one anywhere would
    * delete a neighbor and shift the sums), kept everything else
    * byte-identical, and left the crash orphans invisible. The 100 TB
    * shape CoW cannot serve: a sparse GDPR-style delete costs
    * O(matched rows), not O(touched file bytes). */
  val q67DvDelete: Q = (s, dir) => {
    import graft.sources.DeletionVectors
    val lake = loggedLake(s, dir, tempWork("graft_q67_"))
    DeletionVectors.deleteMor(s, lake, "l_orderkey % 7 = 0")
    DeletionVectors.readMor(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** MERGE-ON-READ upsert, oracle-checked end to end (r8 VERDICT ask
    * #1): the q64 fixture — a string-keyed doc lake on a SHUFFLED
    * layout, bloom-indexed on `doc_key` — upserted through
    * [[graft.sources.DeletionVectors.mergeMor]]: matched rows' old
    * positions land in the `_dv` sidecar (discovered through the
    * string bloom arm, never a full key-column scan), ALL update rows
    * land in one appended delta file, and ONE mutation checkpoint
    * flips data files and vector coverage atomically — ZERO data
    * files rewritten, where CoW MERGE on this shuffled layout would
    * rewrite essentially every file (every congruence class spreads
    * across all of them). The read is [[graft.sources
    * .DeletionVectors.readMor]]: committed ∪ delta minus vectors. The
    * oracle computes the same merged corpus as CASE + UNION ALL over
    * `documents`: the hash match proves position-marking killed
    * exactly the replaced rows (an off-by-one would shift the sums),
    * the delta carried every update row, and the atomic coverage
    * publish lost nothing. The 100 TB shape: a sparse upsert costs
    * O(matched rows), not O(touched file bytes) —
    * `DmlChurnScale`'s MoR cell measures the exponent. */
  val q68DvMerge: Q = (s, dir) => {
    import graft.sources.DeletionVectors
    val (lake, idx, keyed) = docKeyLake(s, dir, tempWork("graft_q68_"))
    val docs = table(s, dir, "documents")
    val upd = keyed(docs.filter(pmod(col("doc_id"), lit(89)) === 1))
      .withColumn("n_chars", col("n_chars") + 500)
    val ins = keyed(docs.filter(pmod(col("doc_id"), lit(103)) === 7))
      .withColumn("doc_key", concat(lit("new-"), col("doc_key")))
      .withColumn("n_chars", col("n_chars") + 13)
    DeletionVectors.mergeMor(s, lake, upd.unionByName(ins),
      Seq("doc_key"), indexDir = Some(idx))
    DeletionVectors.readMor(s, lake)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  /** File skipping ∧ deletion vectors on the READ path, oracle-checked
    * end to end (r8 VERDICT ask #3): lineitem range-clustered on
    * `l_shipdate` into a committed lake, stats-indexed, every
    * `l_orderkey % 7 == 0` row MoR-deleted (zero files rewritten),
    * then a shipping-window probe through [[graft.sources
    * .DeletionVectors.readMorPruned]] — the index prunes to the
    * window's band, the exact predicate re-applies, and the covered
    * vectors anti-join so no dead row survives. The range endpoints
    * are the SAME literals parsed by the SAME session (the q66
    * tz-drift-proof construction). The oracle is the complement ∧
    * window filter over lineitem: the hash match proves pruning lost
    * no live row AND vectors killed no extra one — the composition
    * `DeletionVectorsSpec` pins, now hash-checked cross-engine. The
    * 100 TB shape: a selective probe over a DV'd lake reads a handful
    * of files, not the table, and still never sees a deleted row. */
  val q69DvPrunedScan: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, StatsIndex}
    val work = tempWork("graft_q69_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    table(s, dir, "lineitem")
      .repartitionByRange(6, col("l_shipdate")).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    StatsIndex.build(s, lake, Seq("l_shipdate"), s"$work/idx")
    DeletionVectors.deleteMor(s, lake, "l_orderkey % 7 = 0")
    val (loLit, hiLit) = ("1997-01-01 00:00:00", "1998-12-31 23:59:59")
    def parsed(ts: String): java.time.Instant = {
      val micros = s.sql(s"SELECT unix_micros(TIMESTAMP '$ts') AS m")
        .head.getLong(0)
      java.time.Instant.EPOCH.plusNanos(micros * 1000L)
    }
    DeletionVectors.readMorPruned(s, lake, s"$work/idx",
      Seq(StatsIndex.TimestampRange("l_shipdate",
        parsed(loLit), parsed(hiLit))))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** DV-AWARE metadata-first COUNT, oracle-checked end to end (r8
    * VERDICT ask #4): the q61 shape — z-ordered lake, stats index,
    * 2-D box COUNT from footer metadata — but committed and then
    * MoR-deleted, so [[graft.sources.StatsIndex.countPruned]] must
    * SUBTRACT the covered vectors: interior files contribute
    * `row_count - dead(file)` (still zero data I/O — the sidecar is
    * metadata-scale), the boundary shell scans with the readMor
    * anti-join. The oracle is the plain filtered COUNT over the
    * complement: the hash match proves a DV'd lake can never return a
    * phantom count — the footgun the r8 verdict named, closed
    * end to end rather than by fail-fast. */
  val q70DvMetaCount: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, StatsIndex}
    val work = tempWork("graft_q70_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    ZOrder.write(table(s, dir, "lineitem"), lake,
      Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    StatsIndex.build(s, lake, Seq("l_partkey", "l_suppkey"),
      s"$work/idx")
    DeletionVectors.deleteMor(s, lake, "l_orderkey % 9 = 1")
    val n = StatsIndex.countPruned(s, lake, s"$work/idx",
      Seq(StatsIndex.LongRange("l_partkey", 100L, 1500L),
        StatsIndex.LongRange("l_suppkey", 5L, 90L)))
    import s.implicits._
    Seq(n).toDF("n")
  }

  /** MERGE-ON-READ predicate UPDATE, oracle-checked end to end: the
    * q69 fixture (time-clustered committed lake, `l_orderkey % 7`
    * rows MoR-deleted) updated through [[graft.sources
    * .DeletionVectors.updateMor]] with the `impliedRanges` discovery
    * hint — a shipping-window quantity bump whose matched-row scan
    * reads only the index's candidate band, whose old positions die
    * in the sidecar, and whose post-SET rows land in one delta file;
    * zero data files rewritten. Dead rows are NOT updated: the
    * covered-vector anti-join runs BEFORE the predicate, so an
    * earlier MoR delete can never be resurrected by a later update —
    * the live-view-only semantics the oracle's CASE over the
    * complement encodes. The hash match proves matched discovery,
    * position marking, SET evaluation against the pre-update row and
    * the atomic publish all compose exactly. */
  val q71DvUpdate: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, StatsIndex}
    val work = tempWork("graft_q71_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    table(s, dir, "lineitem")
      .repartitionByRange(6, col("l_shipdate")).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    StatsIndex.build(s, lake, Seq("l_shipdate"), s"$work/idx")
    DeletionVectors.deleteMor(s, lake, "l_orderkey % 7 = 0")
    val (loLit, hiLit) = ("1999-01-01 00:00:00", "2001-01-01 00:00:00")
    def parsed(ts: String): java.time.Instant = {
      val micros = s.sql(s"SELECT unix_micros(TIMESTAMP '$ts') AS m")
        .head.getLong(0)
      java.time.Instant.EPOCH.plusNanos(micros * 1000L)
    }
    DeletionVectors.updateMor(s, lake,
      s"l_shipdate >= TIMESTAMP '$loLit' AND " +
        s"l_shipdate < TIMESTAMP '$hiLit'",
      Map("l_quantity" -> "l_quantity + 5"),
      indexDir = Some(s"$work/idx"),
      impliedRanges = Seq(StatsIndex.TimestampRange("l_shipdate",
        parsed(loLit), parsed(hiLit))))
    DeletionVectors.readMor(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_quantity")).as("sum_qty"))
  }

  /** OPTIMIZE over a DV'd lake, oracle-checked end to end: a MESSY
    * committed lake (random 8-way layout) with every
    * `l_orderkey % 7 == 0` row MoR-deleted is re-clustered by ONE
    * [[ZOrder.optimize]] pass that FOLDS the covered vectors into the
    * rewrite — the input is the MoR live view, so dead rows drop from
    * the new layout, the fresh checkpoint carries no coverage and the
    * dir swap retires the `_dv` sidecar (asserted in-query). The probe
    * is then a plain index-pruned 2-D box scan over the NEW z-ordered
    * layout — no vector anti-join left in the plan. The oracle
    * (complement ∧ box) proves the fold lost no live row and
    * resurrected no dead one. The 100 TB shape: re-clustering a DV'd
    * lake costs ONE rewrite pass, not compact-then-optimize's two. */
  val q72DvOptimize: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, StatsIndex}
    val work = tempWork("graft_q72_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    table(s, dir, "lineitem").repartition(8).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    DeletionVectors.deleteMor(s, lake, "l_orderkey % 7 = 0")
    ZOrder.optimize(s, lake, Seq("l_partkey", "l_suppkey"), bits = 10,
      numFiles = 8, indexDir = Some(s"$work/idx"))
    require(!DeletionVectors.hasDvs(fs, lake),
      "q72: optimize must retire the vectors it folded")
    StatsIndex.readPrunedTyped(s, lake, s"$work/idx",
      Seq(StatsIndex.LongRange("l_partkey", 100L, 1500L),
        StatsIndex.LongRange("l_suppkey", 5L, 90L)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** DV-AWARE metadata-first MIN/MAX, oracle-checked end to end: the
    * q63 shape — z-ordered lake, stats index, typed bounds from footer
    * metadata — but committed and then MoR-deleted with a predicate
    * that KILLS THE GLOBAL EXTREMA (`l_quantity`'s top and bottom
    * bands die everywhere, plus an orderkey stripe), so
    * [[graft.sources.StatsIndex.minMaxPruned]] must demote every
    * DV'd file to a gap file and aggregate only its LIVE rows (the
    * readMor anti-join); footer bounds still record the dead extrema
    * and would leak them under the old fail-fast-free reading. The
    * oracle is min/max over the complement: the hash match proves a
    * deleted extremum can never escape a metadata-first answer —
    * countPruned's q70 guarantee, extended to MIN/MAX. */
  val q73DvMetaMinmax: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, StatsIndex}
    val work = tempWork("graft_q73_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    ZOrder.write(table(s, dir, "lineitem"), lake,
      Seq("l_partkey", "l_suppkey"), bits = 10, numFiles = 8)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    StatsIndex.build(s, lake,
      Seq("l_orderkey", "l_extendedprice", "l_quantity"), s"$work/idx")
    DeletionVectors.deleteMor(s, lake,
      "l_quantity >= 49 OR l_quantity <= 2 OR l_orderkey % 9 = 1")
    StatsIndex.minMaxPruned(s, lake, s"$work/idx",
      Seq("l_orderkey", "l_extendedprice", "l_quantity"))
  }

  /** ROW-LEVEL CDC through merge-on-read mutations, oracle-checked end
    * to end: the add-only file contract (q56's `changedNames`) fails
    * fast across any DML mutation — the consumer must fully resync —
    * but MoR mutations ALREADY record their row-level delta (dead
    * positions in new sidecar files, replacement rows in new delta
    * files), and [[graft.sources.DeletionVectors.readMorChanges]]
    * serves exactly that: capture a [[graft.sources.DeletionVectors
    * .MorCursor]] (two name sets — both write-once, so the pair pins
    * the version), mutate (a MoR delete, an index-free MoR update, a
    * pure-insert MoR merge), then read the NET delta with its
    * `_change_type` column. An update emits delete(old) + insert(new)
    * — Delta CDF's preimage/postimage. The oracle states the same
    * delta declaratively over `documents`: the hash match proves the
    * pair bookkeeping (new-sidecar ∖ cursor, restricted to cursor-era
    * files; new files anti-joined at head) reconstructs the exact row
    * images. The 100 TB shape: the feed reads only the files the new
    * pairs name + the new delta files — cost ∝ churn, never ∝ lake. */
  val q74DvChanges: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors}
    val work = tempWork("graft_q74_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(3).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    val cur = DeletionVectors.cursor(s, lake)
    DeletionVectors.deleteMor(s, lake, "doc_id % 10 = 4")
    DeletionVectors.updateMor(s, lake, "doc_id % 10 = 6",
      Map("n_chars" -> "n_chars + 100"))
    DeletionVectors.mergeMor(s, lake,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .withColumn("doc_id", -col("doc_id")), Seq("doc_id"))
    DeletionVectors.readMorChanges(s, lake, cur)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("_change_type").as("change"))
  }

  /** INCREMENTALLY-MAINTAINED MATERIALIZED VIEW, oracle-checked end to
    * end: a per-language count/sum aggregate over the q74 doc lake is
    * built once ([[graft.sources.IncrementalView.refresh]] — full
    * mode, cursor pinned atomically with the rows), then the SAME
    * mutation window (MoR delete + update + insert-merge) is folded in
    * by a second refresh that aggregates ONLY the row-level change
    * feed — signed per-group deltas, one union + re-aggregate; the
    * in-query require pins that the second pass really ran
    * incrementally. The oracle computes the end-state aggregate
    * directly: the hash match proves count/sum maintenance under ±1
    * signing is bit-exact on integral columns — the view never drifts
    * from what a full recompute would say. The 100 TB shape: the
    * refresh reads the churn, never the lake. */
  val q75IncrView: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, IncrementalView}
    val work = tempWork("graft_q75_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(3).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    IncrementalView.refresh(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"))
    DeletionVectors.deleteMor(s, lake, "doc_id % 10 = 4")
    DeletionVectors.updateMor(s, lake, "doc_id % 10 = 6",
      Map("n_chars" -> "n_chars + 100"))
    DeletionVectors.mergeMor(s, lake,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .withColumn("doc_id", -col("doc_id")), Seq("doc_id"))
    val st = IncrementalView.refresh(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"))
    require(st.mode == "incremental",
      s"q75: the second refresh must be incremental, was ${st.mode}")
    IncrementalView.readView(s, s"$work/view")
  }

  /** RESTORE + VACUUM, oracle-checked end to end through a PLAIN
    * directory read: the [[loggedLake]] fixture rolled back to batch 1
    * by [[graft.sources.CommitLog.restore]] — ONE metadata-scale
    * checkpoint write, zero data I/O; at 100 TB this is the
    * milliseconds-not-re-ingest answer to "last night's batch was
    * bad" — then [[graft.sources.CommitLog.vacuum]] with horizon 0.
    * The rolled-back batch-2 files are now uncommitted orphans, so
    * vacuum MUST sweep them along with the crash orphans, and the
    * plain directory read equals batches 0–1: the hash match proves
    * restore republished exactly the as-of-1 view (a missed manifest
    * would drop a congruence class), vacuum swept ALL rolled-back
    * files (a leftover would double-count), and ONLY those (a swept
    * committed file would drop rows). Restore + retention-vacuum is
    * the Delta RESTORE contract, checked cross-engine. */
  val q76Restore: Q = (s, dir) => {
    import graft.sources.CommitLog
    val lake = loggedLake(s, dir, tempWork("graft_q76_"))
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    CommitLog.restore(fs, lake, toBatchId = 1L)
    CommitLog.vacuum(fs, lake, olderThanMs = 0L)
    s.read.parquet(lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** RESTORE across an append on a DV'd lake, oracle-checked end to
    * end: the [[loggedLake]] fixture MoR-deletes every
    * `l_orderkey % 5 == 0` row (mutation checkpoint at the max id,
    * vectors in the `_dv` sidecar), a junk batch then lands
    * COMMITTED, and [[graft.sources.CommitLog.restore]] rolls back to
    * the mutation checkpoint's id — the EXACT-record arm, where the
    * restored view carries its `dv:` coverage forward, so deletion
    * vectors travel with the rollback. A horizon-0 vacuum then sweeps
    * the junk batch's files and the crash orphans but MUST leave the
    * still-covered sidecar, and [[graft.sources.DeletionVectors
    * .readMor]] serves the restored view. The oracle is the
    * complement filter over lineitem: the hash match proves the
    * rollback dropped exactly the junk batch (its rows would inflate
    * every group), kept the deletion (a lost sidecar would resurrect
    * the %5 class), and vacuum's coverage check protected the
    * sidecar. The 100 TB shape: rollback on a lake with live MoR
    * state stays metadata-only — no compact needed first. */
  val q77RestoreDv: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors}
    val lake = loggedLake(s, dir, tempWork("graft_q77_"))
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    DeletionVectors.deleteMor(s, lake, "l_orderkey % 5 = 0")
    val mutId = CommitLog.maxCommittedId(fs, lake)
    val before = CommitLog.dataFileNames(fs, lake)
    table(s, dir, "lineitem").limit(5000)
      .write.mode("append").parquet(lake)
    CommitLog.commit(fs, lake, mutId + 1,
      (CommitLog.dataFileNames(fs, lake) -- before).toSeq.sorted)
    CommitLog.restore(fs, lake, toBatchId = mutId)
    CommitLog.vacuum(fs, lake, olderThanMs = 0L)
    DeletionVectors.readMor(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** CHECK CONSTRAINTS, oracle-checked end to end: a committed
    * documents lake defines `n_chars > 0` and `length(text) > 0`
    * ([[graft.sources.Constraints.add]] — the Delta ADD CONSTRAINT
    * shape, existing rows validated first), then a POISONED merge
    * (every update row's char count negated) must be rejected by the
    * pre-publish gate — the in-query `require` pins the
    * [[graft.sources.Constraints.ConstraintViolation]] — before the
    * honest twin of the same merge (`n_chars + 700`) lands. The
    * oracle is the CASE expression over documents: the hash match
    * proves the rejected merge left NO trace (a leaked update row or
    * a half-published rewrite would shift the sums) and the valid one
    * applied exactly. The 100 TB shape: the gate reads ONLY the files
    * a write is about to commit — O(churn), never a table scan — so
    * data-quality enforcement costs what the write already cost. */
  val q78Constraints: Q = (s, dir) => {
    import graft.sources.{CommitLog, Constraints, MergeInto}
    val work = tempWork("graft_q78_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    table(s, dir, "documents").repartition(4).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    Constraints.add(s, lake, "chars_positive", "n_chars > 0")
    Constraints.add(s, lake, "text_nonempty", "length(text) > 0")
    val upd = table(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(83)) === 2)
      .withColumn("n_chars", col("n_chars") + 700)
    val rejected =
      try { MergeInto.merge(s, lake,
        upd.withColumn("n_chars", -col("n_chars")), Seq("doc_id")); false }
      catch { case _: Constraints.ConstraintViolation => true }
    require(rejected, "q78: the violating merge was not rejected")
    MergeInto.merge(s, lake, upd, Seq("doc_id"))
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  /** SHALLOW CLONE, oracle-checked end to end: a committed documents
    * lake is branched by [[graft.sources.Clone.shallow]] — the
    * in-query `require` pins the ZERO-COPY contract (no data file
    * physically lands under the branch) — then a CoW merge mutates
    * the BRANCH ONLY (`n_chars + 700` for `doc_id % 83 = 2`; its
    * rewrite writes under the branch, its carried files keep serving
    * from the source dir through the name-resolution chain). The
    * output unions the source's aggregate with the branch's under a
    * `side` tag; the DuckDB oracle is the plain aggregate UNION'd
    * with its CASE twin — the hash match proves isolation BOTH ways
    * (a branch write leaking into the source, or a source row lost to
    * the branch's rewrite, would shift a sum). The 100 TB shape:
    * branching the table costs ONE metadata write however large it
    * is, and the experiment's cost is O(its own churn). */
  val q79Clone: Q = (s, dir) => {
    import graft.sources.{Clone, CommitLog, MergeInto}
    val work = tempWork("graft_q79_")
    val lake = s"$work/lake"
    val branch = s"$work/branch"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    table(s, dir, "documents").repartition(4).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    Clone.shallow(s, lake, branch)
    require(CommitLog.dataFileNames(fs, branch).isEmpty,
      "q79: shallow clone must copy zero data files")
    val srcFiles = CommitLog.dataFileNames(fs, lake)
    val upd = table(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(83)) === 2)
      .withColumn("n_chars", col("n_chars") + 700)
    MergeInto.merge(s, branch, upd, Seq("doc_id"))
    require(CommitLog.dataFileNames(fs, lake) == srcFiles,
      "q79: the branch merge touched the source's file set")
    def agg(d: DataFrame, side: String) = d
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .select(lit(side).as("side"), col("lang"), col("n"),
        col("sum_chars"))
    agg(graft.streaming.LayoutSink.readCommitted(s, lake), "src")
      .unionByName(
        agg(graft.streaming.LayoutSink.readCommitted(s, branch),
          "branch"))
  }

  /** GENERATED ALWAYS AS columns, oracle-checked end to end: a
    * committed documents lake declares `text_len = length(text)`
    * ([[graft.sources.GeneratedColumns.add]] — existing rows validated
    * first), then a POISONED merge supplying `text_len = -1` must be
    * rejected by the pre-publish gate (the in-query `require` pins
    * [[graft.sources.GeneratedColumns.GeneratedColumnViolation]])
    * before the honest merge — which OMITS the column entirely and
    * has it FILLED — lands. The oracle recomputes the derived column
    * independently (`length(text || tail)` in the CASE arm): the hash
    * match proves the fill computed exactly the declared expression,
    * the rejected merge left no trace, and no carried row drifted.
    * The 100 TB shape: the fill is a projection inside the write the
    * merge already pays for; enforcement reads only the
    * about-to-commit files — O(churn), never O(lake). */
  val q80Generated: Q = (s, dir) => {
    import graft.sources.{CommitLog, GeneratedColumns, MergeInto}
    val work = tempWork("graft_q80_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    table(s, dir, "documents")
      .withColumn("text_len", length(col("text")).cast("long"))
      .repartition(4).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    GeneratedColumns.add(s, lake, "text_len", "length(text)")
    val upd = table(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(83)) === 2)
      .withColumn("text", concat(col("text"), lit(" extra-tail")))
    val rejected =
      try { MergeInto.merge(s, lake,
        upd.withColumn("text_len", lit(-1L)), Seq("doc_id")); false }
      catch {
        case _: GeneratedColumns.GeneratedColumnViolation => true
      }
    require(rejected, "q80: the drifted merge was not rejected")
    MergeInto.merge(s, lake, upd, Seq("doc_id")) // text_len FILLED
    graft.streaming.LayoutSink.readCommitted(s, lake)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("text_len")).as("sum_len"))
  }

  /** MIN/MAX + AVG in the INCREMENTALLY-MAINTAINED VIEW (r10),
    * oracle-checked end to end: a per-language (count, sum, min, max)
    * aggregate over a doc lake is built once, then a mutation window
    * lands — a MoR DELETE that removes rows INCLUDING group extrema
    * (every `doc_id % 7 == 2` doc), an UPDATE that raises a tail
    * (`n_chars + 1000` for `doc_id % 9 == 1`), and an insert-merge —
    * and a second refresh folds it in INCREMENTALLY (the in-query
    * `require` pins the mode): counts/sums re-merge under ±1 signing,
    * INSERT extrema fold in monotonically, and the DELETE-touched
    * groups re-scan only their own live rows at the pinned head (a
    * deleted extremum is not invertible from the aggregate — the
    * standard MV maintenance trade, cost ∝ touched groups' rows,
    * never ∝ lake). `avg` is never maintained at all: it derives from
    * the bit-exact (n, sum) pair at read time as one double division.
    * The oracle recomputes the end state declaratively — the hash
    * match proves a deleted minimum really fell out of `min`, the
    * update's new tail entered `max`, and the derived avg agrees to
    * the last bit. */
  val q82IncrViewMinmax: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, IncrementalView}
    val work = tempWork("graft_q82_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(3).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    IncrementalView.refresh(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"), minMaxCols = Seq("n_chars"))
    DeletionVectors.deleteMor(s, lake, "doc_id % 7 = 2")
    DeletionVectors.updateMor(s, lake, "doc_id % 9 = 1",
      Map("n_chars" -> "n_chars + 1000"))
    DeletionVectors.mergeMor(s, lake,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .withColumn("doc_id", -col("doc_id"))
        .withColumn("n_chars", col("n_chars") + 3), Seq("doc_id"))
    val st = IncrementalView.refresh(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"), minMaxCols = Seq("n_chars"))
    require(st.mode == "incremental",
      s"q82: the second refresh must be incremental, was ${st.mode}")
    IncrementalView.readViewWithAvgs(s, s"$work/view", Seq("n_chars"))
  }

  /** FEED-MAINTAINED MATERIALIZED VIEW
    * ([[graft.sources.IncrementalView.refreshFeed]]), oracle-checked
    * end to end — q82's stronger sibling: the view is maintained from
    * the CHANGE DATA FEED, so it stays INCREMENTAL across the verbs
    * that force the MoR-cursor refresh into a full rebuild — a CoW
    * UPDATE, a CoW DELETE, and a vector-folding COMPACT (an empty
    * feed stamp) — plus a MoR delete and a clause-merge INSERT *.
    * Each refresh's `mode == "incremental"` is asserted in-query; the
    * oracle recomputes the end-state aggregate declaratively: the
    * hash match proves signed pre/post-image folding, min/max rescan
    * on removal-touched groups, and the derived avg, bit-exactly. */
  val q89FeedView: Q = (s, dir) => {
    import graft.sources.{ChangeDataFeed, CommitLog, DeletionVectors,
      IncrementalView, MergeInto}
    val work = tempWork("graft_q89_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(3).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    ChangeDataFeed.enable(s, lake)
    IncrementalView.refreshFeed(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"), minMaxCols = Seq("n_chars"))
    MergeInto.update(s, lake, "doc_id % 9 = 1",
      Map("n_chars" -> "n_chars + 1000")) // CoW rewrite
    val st1 = IncrementalView.refreshFeed(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"), minMaxCols = Seq("n_chars"))
    require(st1.mode == "incremental",
      s"q89: refresh across CoW UPDATE must be incremental, was " +
        st1.mode)
    MergeInto.delete(s, lake, "doc_id % 7 = 2") // CoW rewrite
    DeletionVectors.deleteMor(s, lake, "doc_id % 11 = 3")
    DeletionVectors.compact(s, lake) // physical fold: empty stamp
    MergeInto.mergeClauses(s, lake,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .withColumn("doc_id", -col("doc_id"))
        .withColumn("n_chars", col("n_chars") + 3), Seq("doc_id"),
      notMatched = Seq(MergeInto.NotMatchedInsert()))
    val st2 = IncrementalView.refreshFeed(s, lake, s"$work/view",
      Seq("lang"), Seq("n_chars"), minMaxCols = Seq("n_chars"))
    require(st2.mode == "incremental",
      s"q89: refresh across delete/compact/merge must be " +
        s"incremental, was ${st2.mode}")
    IncrementalView.readViewWithAvgs(s, s"$work/view", Seq("n_chars"))
  }

  /** TIME TRAVEL ACROSS DML MUTATIONS (the r10 versioned log),
    * oracle-checked end to end: the [[loggedLake]] fixture is
    * MoR-MERGED (`l_quantity + 100` for every `l_orderkey % 7 == 0`
    * row — a mutation checkpoint at the max id), a junk batch then
    * lands COMMITTED above it, and a second mutation (MoR DELETE of
    * pre-1994 shipments) follows — the exact append → MERGE → append
    * history a production lake accrues. The query reads the version
    * AS PUBLISHED BETWEEN the mutations
    * ([[graft.sources.DeletionVectors.readMorAsOf]]): merge applied,
    * junk batch and delete both invisible. Through r9 this failed
    * fast — one DML truncated the whole earlier history; now a DML
    * record is TRANSPARENT to version resolution (it sweeps nothing),
    * so audit/debug reads against "the table before yesterday's
    * backfill" work, which is the point of time travel — backfills
    * ARE DML. The oracle is the CASE-reconstruction of exactly that
    * version over lineitem: the hash match proves the as-of view
    * carries the merge's replacements exactly once (a lost vector
    * would double-count a matched row), none of the junk batch (its
    * rows would inflate every group), and none of the later delete
    * (its victims must still be served). In-query `require`s pin the
    * history surface: both mutations reachable, the junk manifest
    * reachable, per-commit churn counts on the merge record. The
    * 100 TB shape: the as-of read is METADATA resolution + one scan
    * of exactly that version's files — no snapshot copies, ever. */
  val q81TimeTravelDml: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors}
    val lake = loggedLake(s, dir, tempWork("graft_q81_"))
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val li = table(s, dir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val upd = li.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    DeletionVectors.mergeMor(s, lake, upd, keys)
    val mutId = CommitLog.maxCommittedId(fs, lake)
    val before = CommitLog.dataFileNames(fs, lake)
    li.limit(3000).withColumn("l_quantity", col("l_quantity") + 0.125)
      .write.mode("append").parquet(lake)
    CommitLog.commit(fs, lake, mutId + 1,
      (CommitLog.dataFileNames(fs, lake) -- before).toSeq.sorted)
    DeletionVectors.deleteMor(s, lake,
      "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'")
    val h = CommitLog.history(fs, lake)
    require(h.count(r => r.kind == "mutation" && r.reachable) == 2,
      "q81: both DML mutations must be live, reachable versions")
    require(h.exists(r => r.kind == "manifest" && r.id == mutId + 1 &&
      r.reachable), "q81: the junk manifest must stay reachable")
    val merge = h.filter(r => r.kind == "mutation" && r.id == mutId)
      .maxBy(_.gen)
    require(merge.addedFiles == 1 && merge.removedFiles == 0,
      "q81: the MoR merge must carry its per-commit delta " +
        s"(got add=${merge.addedFiles} rm=${merge.removedFiles})")
    DeletionVectors.readMorAsOf(s, lake, asOf = mutId)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
  }

  /** OPTIMISTIC-CONCURRENCY DML (r10), oracle-checked end to end:
    * THREE appenders race their lineitem congruence classes into one
    * lake through [[graft.sources.Occ.append]] (real concurrent
    * futures — data writes overlap, only the ~ms id-claim
    * serializes), then an OCC MoR upsert ([[graft.sources.Occ
    * .mergeMor]]: `l_quantity + 100` for every `l_orderkey % 7 == 0`
    * row) and an OCC MoR delete ([[graft.sources.Occ.deleteMor]]:
    * `l_orderkey % 11 == 5`) land with the lock held only for their
    * metadata commit sections. The oracle is the declarative end
    * state over lineitem: the hash match proves the racing appends
    * covered every row EXACTLY once in whatever order they committed
    * (a cross-attributed or lost manifest would shift every group),
    * the upsert replaced each matched row exactly once (a torn
    * snapshot would double-serve or drop replacements), and the
    * delete's vectors compose with the merge's. The 100 TB shape:
    * independent ingest pipelines sharing a lake no longer serialize
    * their multi-second writes behind one writer lock — SCALE.md
    * §"Commit throughput" measures the 2.7× at 4 appenders. */
  val q83OccDml: Q = (s, dir) => {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    import graft.sources.{DeletionVectors, Occ}
    val work = tempWork("graft_q83_")
    val lake = s"$work/lake"
    val li = table(s, dir, "lineitem")
    val futs = (0 to 2).map { b =>
      Future(Occ.append(s, lake,
        li.filter(pmod(col("l_orderkey"), lit(3)) === b)))
    }
    val ids = futs.map(Await.result(_, 10.minutes))
    require(ids.toSet.size == 3 && ids.forall(_ >= 0),
      s"q83: the racing appends must claim three distinct ids ($ids)")
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val upd = li.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    Occ.mergeMor(s, lake, upd, keys)
    Occ.deleteMor(s, lake, "l_orderkey % 11 = 5")
    DeletionVectors.readMor(s, lake)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
  }

  /** 3-D Hilbert cells, oracle-checked: [[ZOrder.hilbertValueN]]'s
    * Skilling descent (codegen'd [[graft.functions.HilbertIndexN]])
    * aggregated per curve cell. The oracle UNROLLS the same phases as
    * a generated CTE chain ([[ZOrder.sqlHilbertNCte]]) — the hash match
    * proves every (level, dimension) undo step, the Gray encode, the
    * parity xor and the bit gather cross-engine, in three dimensions. */
  val q48Hilbert3: Q = (s, dir) => {
    val h = ZOrder.hilbertValueN(Seq(
      pmod(col("l_partkey"), lit(64)), pmod(col("l_suppkey"), lit(64)),
      pmod(col("l_orderkey"), lit(64))), bits = 6)
    table(s, dir, "lineitem")
      .withColumn("hcell", shiftright(h, 10))
      .groupBy(col("hcell"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"))
  }

  /** COLUMN MAPPING end to end ([[graft.sources.ColumnMapping]] — r10
    * VERDICT ask #3): append half of lineitem, build a stats index,
    * RENAME two columns and DROP one (three metadata-only record
    * publishes — zero data I/O, every committed file keeps its
    * physical schema), append the other half UNDER THE NEW LOGICAL
    * NAMES (the write path projects them back to the shared physical
    * names), then answer a pruned aggregate: the pre-rename index
    * prunes under the MAPPED name ([[ColumnMapping.physicalName]] —
    * no index rebuild on rename), the read surfaces both generations
    * as one logical schema, and the dropped column is hidden. The
    * oracle is the plain filtered aggregate over lineitem under the
    * ORIGINAL names: a hash match proves the mapping changed names
    * only — never a value, a row, or the pruning answer. */
  val q84ColumnMapping: Q = (s, dir) => {
    import graft.sources.{ColumnMapping, Occ, StatsIndex}
    val work = tempWork("graft_q84_")
    val lake = s"$work/lake"
    val idx = s"$work/idx"
    val li = table(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_partkey"), col("l_quantity"),
      col("l_returnflag"), col("l_tax"))
    require(Occ.append(s, lake,
      li.filter(col("l_orderkey") % 2 === 0), numFiles = 4) >= 0L)
    StatsIndex.build(s, lake, Seq("l_partkey"), idx)
    ColumnMapping.rename(s, lake, "l_quantity", "qty")
    ColumnMapping.rename(s, lake, "l_partkey", "part")
    ColumnMapping.drop(s, lake, "l_tax")
    require(Occ.append(s, lake,
      li.filter(col("l_orderkey") % 2 === 1)
        .withColumnRenamed("l_quantity", "qty")
        .withColumnRenamed("l_partkey", "part")
        .drop("l_tax"), numFiles = 4) > 0L)
    StatsIndex.refresh(s, lake, Seq("l_partkey"), idx)
    val logical = graft.streaming.LayoutSink.readCommitted(s, lake,
      mergeSchema = true)
    require(!logical.columns.contains("l_tax"),
      "q84: the dropped column must be hidden from committed reads")
    require(logical.columns.contains("qty") &&
      logical.columns.contains("part"),
      "q84: renamed columns must surface under their logical names")
    val phys = ColumnMapping.physicalName(s, lake, "part") // l_partkey
    val pruned = ColumnMapping.toLogical(s, lake,
      StatsIndex.readPruned(s, lake, idx, Seq((phys, 100L, 1500L))))
    pruned.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("qty")).as("sum_qty"),
        max(col("part")).as("max_part"))
  }

  /** AGE-BASED RETENTION end to end
    * ([[graft.sources.CommitLog.retention]] — r10 VERDICT ask #6): a
    * doc lake takes a MoR delete + update + insert-merge (row-level
    * history at id 0) and a later append, then a retention pass with
    * the cutoff between them expires every superseded version — the
    * mutation trail folds into ONE `.fold.mutation.` base carrying
    * the deletion-vector coverage, the expired records are gone, and
    * the lake still answers EXACTLY its pre-retention content (the
    * clock is injected, so the probe is deterministic). The oracle
    * computes the end state declaratively from `documents`: the hash
    * match proves retention is a pure metadata/history operation —
    * it can expire a week of versions without moving one committed
    * row. */
  val q85Retention: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors, Occ}
    val work = tempWork("graft_q85_")
    val lake = s"$work/lake"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(3).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    DeletionVectors.deleteMor(s, lake, "doc_id % 7 = 2")
    DeletionVectors.updateMor(s, lake, "doc_id % 7 = 3",
      Map("n_chars" -> "n_chars + 50"))
    DeletionVectors.mergeMor(s, lake,
      docs.filter(pmod(col("doc_id"), lit(7)) === 1)
        .withColumn("doc_id", -col("doc_id")), Seq("doc_id"))
    require(Occ.append(s, lake,
      docs.filter(pmod(col("doc_id"), lit(7)) === 5)
        .withColumn("doc_id", col("doc_id") + 1000000L)) > 0L)
    // cutoff one hour in the (injected) future: every version the
    // append superseded expires; the append itself never does
    val (expired, _) = CommitLog.retention(fs, lake,
      olderThanMs = 3600000L, graceMs = 0L,
      nowMs = System.currentTimeMillis() + 7200000L)
    require(expired == 4,
      s"q85: the base manifest + three mutation generations expire " +
        s"(saw $expired)")
    DeletionVectors.readMor(s, lake)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
  }

  /** TIMESTAMP AS OF — Delta's wall-clock time travel
    * ([[graft.sources.CommitLog.committedViewAtTime]]): the version
    * served is the newest one PUBLISHED at-or-before the requested
    * instant. The probe pins the log records to spaced deterministic
    * timestamps (the same injectable clock retention uses), then
    * reads TWO instants: one between the second and third append
    * (→ exactly batches 0–1) and one after a MoR delete (→ the full
    * table minus the dead rows, vectors applied through the
    * [[graft.sources.DeletionVectors.readMorAtTime]] surface). The
    * oracle computes both pinned states declaratively; the hash match
    * proves timestamp resolution picks exactly the right version on
    * both sides of a mutation — never an empty view, never a torn
    * one. */
  val q86TimeTravelTs: Q = (s, dir) => {
    import graft.sources.{CommitLog, DeletionVectors}
    val lake = loggedLake(s, dir, tempWork("graft_q86_"))
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    DeletionVectors.deleteMor(s, lake, "l_orderkey % 11 = 5")
    // pin the publish clock: batch b at T + 1000·b, the mutation after
    val T = 1700000000000L
    val log = new org.apache.hadoop.fs.Path(CommitLog.logDir(lake))
    fs.listStatus(log).foreach { st =>
      val n = st.getPath.getName
      val t =
        if (n == "0.manifest") T
        else if (n == "1.manifest") T + 1000L
        else if (n == "2.manifest") T + 2000L
        else if (n.endsWith(".checkpoint")) T + 3000L
        else -1L
      if (t >= 0) fs.setTimes(st.getPath, t, -1)
    }
    val pre = graft.streaming.LayoutSink
      .readCommittedAtTime(s, lake, T + 1500L) // batches 0 and 1
    val post = DeletionVectors
      .readMorAtTime(s, lake, T + 3500L) // head, dead rows gone
    pre.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
      .withColumn("pin", lit("pre"))
      .unionByName(
        post.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sumd(col("l_quantity")).as("sum_qty"))
          .withColumn("pin", lit("post")))
  }

  val defs: Map[String, Q] = Map(
    "q86_time_travel_ts" -> q86TimeTravelTs,
    "q85_retention" -> q85Retention,
    "q84_column_mapping" -> q84ColumnMapping,
    "q54_time_travel" -> q54TimeTravel,
    "q55_vacuum" -> q55Vacuum,
    "q56_read_changes" -> q56ReadChanges,
    "q57_merge_upsert" -> q57MergeUpsert,
    "q87_merge_clauses" -> q87MergeClauses,
    "q88_change_feed" -> q88ChangeFeed,
    "q90_merge_clauses_mor" -> q90MergeClausesMor,
    "q91_occ_merge_clauses" -> q91OccMergeClauses,
    "q92_reorg_purge" -> q92ReorgPurge,
    "q95_purge_staged" -> q95PurgeStaged,
    "q93_meta_group_count" -> q93MetaGroupCount,
    "q96_meta_group_minmax" -> q96MetaGroupMinmax,
    "q94_incr_view_distinct" -> q94IncrViewDistinct,
    "q58_delete" -> q58Delete,
    "q59_schema_evolution" -> q59SchemaEvolution,
    "q60_update" -> q60Update,
    "q61_meta_count" -> q61MetaCount,
    "q62_dfp_join" -> q62DfpJoin,
    "q63_meta_minmax" -> q63MetaMinmax,
    "q64_merge_string_key" -> q64MergeStringKey,
    "q65_inlist_scan" -> q65InlistScan,
    "q66_delete_pruned" -> q66DeletePruned,
    "q67_dv_delete" -> q67DvDelete,
    "q68_dv_merge" -> q68DvMerge,
    "q69_dv_pruned_scan" -> q69DvPrunedScan,
    "q70_dv_meta_count" -> q70DvMetaCount,
    "q71_dv_update" -> q71DvUpdate,
    "q72_dv_optimize" -> q72DvOptimize,
    "q73_dv_meta_minmax" -> q73DvMetaMinmax,
    "q74_dv_changes" -> q74DvChanges,
    "q75_incr_view" -> q75IncrView,
    "q76_restore" -> q76Restore,
    "q77_restore_dv" -> q77RestoreDv,
    "q78_constraints" -> q78Constraints,
    "q79_clone" -> q79Clone,
    "q80_generated" -> q80Generated,
    "q81_time_travel_dml" -> q81TimeTravelDml,
    "q82_incr_view_minmax" -> q82IncrViewMinmax,
    "q89_feed_view" -> q89FeedView,
    "q83_occ_dml" -> q83OccDml,
    "qo1_orc" -> qo1Orc,
    "q53_ts_bloom_scan" -> q53TsBloomScan,
    "q52_ts_pruned_scan" -> q52TsPrunedScan,
    "q51_double_bloom_scan" -> q51DoubleBloomScan,
    "q50_bloom_pruned_scan" -> q50BloomPrunedScan,
    "q48_hilbert3" -> q48Hilbert3,
    "q47_typed_pruned_scan" -> q47TypedPrunedScan,
    "q46_pruned_scan" -> q46PrunedScan,
    "q45_hilbert" -> q45Hilbert,
    "q43_zorder" -> q43ZOrder,
    "qi2_rolling_trend" -> qi2RollingTrend,
    "qj1_json" -> qj1Json,
    "q25_sessionize" -> q25Sessionize,
    "q26_median" -> q26Median,
    "q19_rank_frames" -> q19RankFrames,
    "q20_asof_join" -> q20AsofJoin,
    "q38_asof_forward" -> q38AsofForward,
    "q39_asof_nearest" -> q39AsofNearest,
    "q21_range_join" -> q21RangeJoin,
    "q22_pivot" -> q22Pivot,
    "q23_corr" -> q23Corr,
    "q24_cube" -> q24Cube,
    "qi1_indicator_frames" -> qi1IndicatorFrames)

  val sql: Map[String, String] = Map(
    "q95_purge_staged" ->
      s"""WITH live AS (
         |  SELECT l_returnflag, l_quantity
         |  FROM lineitem WHERE l_orderkey % 7 <> 3
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity
         |  FROM lineitem
         |  WHERE l_orderkey % 11 = 5 AND l_orderkey % 7 <> 3
         |)
         |SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty
         |FROM live GROUP BY 1""".stripMargin,
    "q93_meta_group_count" ->
      "SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1",
    "q96_meta_group_minmax" ->
      """SELECT lang, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q94_incr_view_distinct" ->
      """WITH final AS (
        |  SELECT lang, n_chars AS nc,
        |    CASE WHEN doc_id % 10 = 6 THEN 'relabeled'
        |         ELSE source END AS src
        |  FROM documents WHERE doc_id % 10 <> 4
        |  UNION ALL
        |  SELECT lang, n_chars AS nc, 'minted' AS src
        |  FROM documents WHERE doc_id % 10 = 3
        |)
        |SELECT lang, count(*) AS n,
        |  CAST(sum(nc) AS BIGINT) AS sum_n_chars,
        |  count(DISTINCT src) AS nd_source
        |FROM final GROUP BY 1""".stripMargin,
    "q92_reorg_purge" ->
      s"""WITH live AS (
         |  SELECT l_returnflag, l_quantity, CAST(NULL AS DOUBLE) AS c
         |  FROM lineitem WHERE l_orderkey % 7 <> 3
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity, CAST(NULL AS DOUBLE) AS c
         |  FROM lineitem WHERE l_orderkey % 11 = 5
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity, 9.99 AS c
         |  FROM lineitem WHERE l_orderkey % 13 = 1
         |)
         |SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty,
         |  count(c) AS n_tax
         |FROM live GROUP BY 1""".stripMargin,
    "q54_time_travel" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_orderkey % 3 <= 1
         |GROUP BY 1""".stripMargin,
    "q55_vacuum" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |GROUP BY 1""".stripMargin,
    "q56_read_changes" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_orderkey % 3 >= 1
         |GROUP BY 1""".stripMargin,
    "q57_merge_upsert" ->
      s"""WITH merged AS (
         |  SELECT l_returnflag,
         |    CASE WHEN l_orderkey % 7 = 0 THEN l_quantity + 100
         |         ELSE l_quantity END AS q
         |  FROM lineitem
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity + 0.5 AS q
         |  FROM lineitem WHERE l_orderkey % 11 = 3
         |)
         |SELECT l_returnflag, count(*) AS n, ${sqlSumd("q")} AS sum_qty
         |FROM merged GROUP BY 1""".stripMargin,
    "q88_change_feed" ->
      s"""WITH feed AS (
         |  SELECT 'update_preimage' AS _change_type,
         |    CAST(1 AS BIGINT) AS _commit_gen, l_returnflag,
         |    l_quantity AS q
         |  FROM lineitem WHERE l_orderkey % 3 < 2 AND l_returnflag = 'R'
         |  UNION ALL
         |  SELECT 'update_postimage', CAST(1 AS BIGINT), l_returnflag,
         |    l_quantity + 5
         |  FROM lineitem WHERE l_orderkey % 3 < 2 AND l_returnflag = 'R'
         |  UNION ALL
         |  SELECT 'delete', CAST(2 AS BIGINT), l_returnflag,
         |    CASE WHEN l_returnflag = 'R' THEN l_quantity + 5
         |         ELSE l_quantity END
         |  FROM lineitem WHERE l_orderkey % 3 < 2 AND l_orderkey % 7 = 0
         |  UNION ALL
         |  SELECT 'insert', CAST(0 AS BIGINT), l_returnflag, l_quantity
         |  FROM lineitem WHERE l_orderkey % 3 = 2
         |)
         |SELECT _change_type, _commit_gen, l_returnflag,
         |  count(*) AS n, ${sqlSumd("q")} AS sum_qty
         |FROM feed GROUP BY 1, 2, 3""".stripMargin,
    "q90_merge_clauses_mor" ->
      s"""WITH merged AS (
         |  SELECT l_returnflag,
         |    CASE WHEN l_orderkey % 5 = 0 THEN l_quantity + 50
         |         ELSE l_quantity END AS q,
         |    CASE WHEN l_orderkey % 5 <> 0 AND l_linestatus = 'O'
         |         THEN 0.99 ELSE l_discount END AS d
         |  FROM lineitem
         |  WHERE NOT (l_orderkey % 5 = 0 AND l_returnflag = 'R')
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity AS q, l_discount AS d
         |  FROM lineitem WHERE l_orderkey % 13 = 1 AND l_quantity > 25
         |)
         |SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("q")} AS sum_qty, ${sqlSumd("d")} AS sum_disc
         |FROM merged GROUP BY 1""".stripMargin,
    "q87_merge_clauses" ->
      s"""WITH merged AS (
         |  SELECT l_returnflag,
         |    CASE WHEN l_orderkey % 5 = 0 THEN l_quantity + 50
         |         ELSE l_quantity END AS q,
         |    CASE WHEN l_orderkey % 5 <> 0 AND l_linestatus = 'O'
         |         THEN 0.99 ELSE l_discount END AS d
         |  FROM lineitem
         |  WHERE NOT (l_orderkey % 5 = 0 AND l_returnflag = 'R')
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity AS q, l_discount AS d
         |  FROM lineitem WHERE l_orderkey % 13 = 1 AND l_quantity > 25
         |)
         |SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("q")} AS sum_qty, ${sqlSumd("d")} AS sum_disc
         |FROM merged GROUP BY 1""".stripMargin,
    "q91_occ_merge_clauses" ->
      s"""WITH cow AS (
         |  SELECT l_returnflag,
         |    CASE WHEN l_orderkey % 5 = 0 THEN l_quantity + 50
         |         ELSE l_quantity END AS q,
         |    CASE WHEN l_orderkey % 5 <> 0 AND l_linestatus = 'O'
         |         THEN 0.99 ELSE l_discount END AS d
         |  FROM lineitem
         |  WHERE NOT (l_orderkey % 5 = 0 AND l_returnflag = 'R')
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity AS q, l_discount AS d
         |  FROM lineitem WHERE l_orderkey % 13 = 1 AND l_quantity > 25
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity AS q, l_discount AS d
         |  FROM lineitem WHERE l_orderkey % 17 = 3
         |), mor AS (
         |  SELECT l_returnflag,
         |    CASE WHEN l_orderkey % 5 = 0 THEN l_quantity + 50
         |         ELSE l_quantity END AS q,
         |    CASE WHEN l_orderkey % 5 <> 0 AND l_linestatus = 'O'
         |         THEN 0.99 ELSE l_discount END AS d
         |  FROM lineitem
         |  WHERE NOT (l_orderkey % 19 = 4)
         |    AND NOT (l_orderkey % 5 = 0 AND l_returnflag = 'R')
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity AS q, l_discount AS d
         |  FROM lineitem WHERE l_orderkey % 13 = 1 AND l_quantity > 25
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity + 50 AS q, l_discount AS d
         |  FROM lineitem WHERE l_orderkey % 5 = 0 AND l_orderkey % 19 = 4
         |    AND l_quantity + 50 > 25
         |)
         |SELECT 'cow' AS mode, l_returnflag, count(*) AS n,
         |  ${sqlSumd("q")} AS sum_qty, ${sqlSumd("d")} AS sum_disc
         |FROM cow GROUP BY 1, 2
         |UNION ALL
         |SELECT 'mor' AS mode, l_returnflag, count(*) AS n,
         |  ${sqlSumd("q")} AS sum_qty, ${sqlSumd("d")} AS sum_disc
         |FROM mor GROUP BY 1, 2""".stripMargin,
    "q58_delete" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE NOT (l_shipdate < TIMESTAMP '1996-01-01 00:00:00')
         |GROUP BY 1""".stripMargin,
    "q61_meta_count" ->
      """SELECT count(*) AS n FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 1500
        |  AND l_suppkey BETWEEN 5 AND 90""".stripMargin,
    "q62_dfp_join" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price,
         |  ${sqlSumd("p_retailprice")} AS sum_retail
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_partkey BETWEEN 50 AND 120 AND p_size <= 25
         |GROUP BY 1""".stripMargin,
    "q64_merge_string_key" ->
      """WITH merged AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 97 = 0 THEN n_chars + 1000
        |         ELSE n_chars END AS nc
        |  FROM documents
        |  UNION ALL
        |  SELECT lang, n_chars + 7 AS nc
        |  FROM documents WHERE doc_id % 101 = 5
        |)
        |SELECT lang, count(*) AS n, CAST(sum(nc) AS BIGINT) AS sum_chars
        |FROM merged GROUP BY 1""".stripMargin,
    "q65_inlist_scan" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_orderkey IN (${(1 to 100).map(_ * 29).mkString(", ")})
         |GROUP BY 1""".stripMargin,
    "q66_delete_pruned" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE NOT (l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
         |GROUP BY 1""".stripMargin,
    "q67_dv_delete" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE NOT (l_orderkey % 7 = 0)
         |GROUP BY 1""".stripMargin,
    "q68_dv_merge" ->
      """WITH merged AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 89 = 1 THEN n_chars + 500
        |         ELSE n_chars END AS nc
        |  FROM documents
        |  UNION ALL
        |  SELECT lang, n_chars + 13 AS nc
        |  FROM documents WHERE doc_id % 103 = 7
        |)
        |SELECT lang, count(*) AS n, CAST(sum(nc) AS BIGINT) AS sum_chars
        |FROM merged GROUP BY 1""".stripMargin,
    "q69_dv_pruned_scan" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE NOT (l_orderkey % 7 = 0)
         |  AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
         |    AND TIMESTAMP '1998-12-31 23:59:59'
         |GROUP BY 1""".stripMargin,
    "q70_dv_meta_count" ->
      """SELECT count(*) AS n FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 1500
        |  AND l_suppkey BETWEEN 5 AND 90
        |  AND NOT (l_orderkey % 9 = 1)""".stripMargin,
    "q71_dv_update" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd(
        "CASE WHEN l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' " +
          "AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00' " +
          "THEN l_quantity + 5 ELSE l_quantity END")} AS sum_qty
         |FROM lineitem
         |WHERE NOT (l_orderkey % 7 = 0)
         |GROUP BY 1""".stripMargin,
    "q72_dv_optimize" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE NOT (l_orderkey % 7 = 0)
         |  AND l_partkey BETWEEN 100 AND 1500
         |  AND l_suppkey BETWEEN 5 AND 90
         |GROUP BY 1""".stripMargin,
    "q75_incr_view" ->
      """WITH final AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 10 = 6 THEN n_chars + 100
        |         ELSE n_chars END AS nc
        |  FROM documents WHERE doc_id % 10 <> 4
        |  UNION ALL
        |  SELECT lang, n_chars AS nc
        |  FROM documents WHERE doc_id % 10 = 3
        |)
        |SELECT lang, count(*) AS n,
        |  CAST(sum(nc) AS BIGINT) AS sum_n_chars
        |FROM final GROUP BY 1""".stripMargin,
    "q76_restore" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_orderkey % 3 <= 1
         |GROUP BY 1""".stripMargin,
    "q77_restore_dv" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE NOT (l_orderkey % 5 = 0)
         |GROUP BY 1""".stripMargin,
    "q81_time_travel_dml" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd(
        "CASE WHEN l_orderkey % 7 = 0 THEN l_quantity + 100 " +
          "ELSE l_quantity END")} AS sum_qty
         |FROM lineitem
         |GROUP BY 1""".stripMargin,
    "q82_incr_view_minmax" ->
      """WITH final AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 9 = 1 THEN n_chars + 1000
        |         ELSE n_chars END AS nc
        |  FROM documents WHERE NOT (doc_id % 7 = 2)
        |  UNION ALL
        |  SELECT lang, n_chars + 3 AS nc
        |  FROM documents WHERE doc_id % 10 = 3
        |)
        |SELECT lang, count(*) AS n,
        |  CAST(sum(nc) AS BIGINT) AS sum_n_chars,
        |  min(nc) AS min_n_chars, max(nc) AS max_n_chars,
        |  CAST(sum(nc) AS DOUBLE) / count(*) AS avg_n_chars
        |FROM final GROUP BY 1""".stripMargin,
    "q89_feed_view" ->
      """WITH final AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 9 = 1 THEN n_chars + 1000
        |         ELSE n_chars END AS nc
        |  FROM documents
        |  WHERE NOT (doc_id % 7 = 2) AND NOT (doc_id % 11 = 3)
        |  UNION ALL
        |  SELECT lang, n_chars + 3 AS nc
        |  FROM documents WHERE doc_id % 10 = 3
        |)
        |SELECT lang, count(*) AS n,
        |  CAST(sum(nc) AS BIGINT) AS sum_n_chars,
        |  min(nc) AS min_n_chars, max(nc) AS max_n_chars,
        |  CAST(sum(nc) AS DOUBLE) / count(*) AS avg_n_chars
        |FROM final GROUP BY 1""".stripMargin,
    "q83_occ_dml" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd(
        "CASE WHEN l_orderkey % 7 = 0 THEN l_quantity + 100 " +
          "ELSE l_quantity END")} AS sum_qty
         |FROM lineitem
         |WHERE NOT (l_orderkey % 11 = 5)
         |GROUP BY 1""".stripMargin,
    "q78_constraints" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 83 = 2 THEN n_chars + 700
        |           ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY 1""".stripMargin,
    "q79_clone" ->
      """SELECT 'src' AS side, lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 2
        |UNION ALL
        |SELECT 'branch' AS side, lang, count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 83 = 2 THEN n_chars + 700
        |           ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 2""".stripMargin,
    "q80_generated" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 83 = 2
        |           THEN length(text || ' extra-tail')
        |           ELSE length(text) END) AS BIGINT) AS sum_len
        |FROM documents
        |GROUP BY 1""".stripMargin,
    "q74_dv_changes" ->
      """SELECT doc_id, lang, n_chars, 'delete' AS change
        |FROM documents WHERE doc_id % 10 IN (4, 6)
        |UNION ALL
        |SELECT doc_id, lang, n_chars + 100 AS n_chars,
        |  'insert' AS change
        |FROM documents WHERE doc_id % 10 = 6
        |UNION ALL
        |SELECT -doc_id AS doc_id, lang, n_chars, 'insert' AS change
        |FROM documents WHERE doc_id % 10 = 3""".stripMargin,
    "q73_dv_meta_minmax" ->
      """SELECT min(l_orderkey) AS min_l_orderkey,
        |  max(l_orderkey) AS max_l_orderkey,
        |  min(l_extendedprice) AS min_l_extendedprice,
        |  max(l_extendedprice) AS max_l_extendedprice,
        |  min(l_quantity) AS min_l_quantity,
        |  max(l_quantity) AS max_l_quantity
        |FROM lineitem
        |WHERE NOT (l_quantity >= 49 OR l_quantity <= 2
        |  OR l_orderkey % 9 = 1)""".stripMargin,
    "q63_meta_minmax" ->
      """SELECT min(l_orderkey) AS min_l_orderkey,
        |  max(l_orderkey) AS max_l_orderkey,
        |  min(l_extendedprice) AS min_l_extendedprice,
        |  max(l_extendedprice) AS max_l_extendedprice,
        |  min(l_quantity) AS min_l_quantity,
        |  max(l_quantity) AS max_l_quantity
        |FROM lineitem""".stripMargin,
    "q60_update" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd(
        "CASE WHEN l_returnflag = 'R' THEN l_quantity + 5 " +
          "ELSE l_quantity END")} AS sum_qty,
         |  ${sqlSumd(
        "CASE WHEN l_returnflag = 'R' THEN l_discount * 0.5 " +
          "ELSE l_discount END")} AS sum_disc
         |FROM lineitem
         |GROUP BY 1""".stripMargin,
    "q86_time_travel_ts" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty, 'pre' AS pin
         |FROM lineitem WHERE l_orderkey % 3 <> 2
         |GROUP BY 1
         |UNION ALL
         |SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty, 'post' AS pin
         |FROM lineitem WHERE NOT (l_orderkey % 11 = 5)
         |GROUP BY 1""".stripMargin,
    "q85_retention" ->
      s"""WITH final AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id % 7 = 3 THEN n_chars + 50
         |      ELSE n_chars END AS n_chars
         |  FROM documents WHERE doc_id % 7 <> 2
         |  UNION ALL
         |  SELECT -doc_id, lang, n_chars
         |  FROM documents WHERE doc_id % 7 = 1
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, n_chars
         |  FROM documents WHERE doc_id % 7 = 5
         |)
         |SELECT lang, count(*) AS n,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM final GROUP BY 1""".stripMargin,
    "q84_column_mapping" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty,
         |  max(l_partkey) AS max_part
         |FROM lineitem
         |WHERE l_partkey BETWEEN 100 AND 1500
         |GROUP BY 1""".stripMargin,
    "q59_schema_evolution" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd(
        "CASE WHEN l_orderkey % 7 = 0 THEN l_quantity * 0.1 ELSE 0 END")
      } AS sum_bonus
         |FROM lineitem
         |GROUP BY 1""".stripMargin,
    "qo1_orc" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price,
         |  max(l_shipdate) AS max_ship
         |FROM lineitem
         |WHERE l_quantity >= 25
         |GROUP BY 1""".stripMargin,
    "q53_ts_bloom_scan" ->
      s"""SELECT event_type, count(*) AS n,
         |  ${sqlSumd("value")} AS sum_value
         |FROM events
         |WHERE ts = (SELECT ts FROM events ORDER BY event_id LIMIT 1)
         |GROUP BY 1""".stripMargin,
    "q52_ts_pruned_scan" ->
      s"""SELECT event_type, count(*) AS n,
         |  ${sqlSumd("value")} AS sum_value
         |FROM events
         |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
         |  AND TIMESTAMP '2024-01-14 23:59:59'
         |GROUP BY 1""".stripMargin,
    "q51_double_bloom_scan" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_extendedprice = (
         |  SELECT l_extendedprice FROM lineitem
         |  ORDER BY l_orderkey, l_linenumber LIMIT 1)
         |GROUP BY 1""".stripMargin,
    "q50_bloom_pruned_scan" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_orderkey = 1
         |GROUP BY 1""".stripMargin,
    "q48_hilbert3" -> {
      val (cte, fin) = ZOrder.sqlHilbertNCte(
        Seq("l_partkey % 64", "l_suppkey % 64", "l_orderkey % 64"),
        bits = 6, table = "lineitem", carry = Seq("l_extendedprice"))
      s"""WITH $cte
         |SELECT hd >> 10 AS hcell, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM $fin GROUP BY 1""".stripMargin
    },
    "q47_typed_pruned_scan" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_extendedprice BETWEEN 10000.5 AND 30000.25
         |  AND l_shipdate BETWEEN TIMESTAMP '1993-01-01 00:00:00'
         |    AND TIMESTAMP '1996-06-30 23:59:59'
         |  AND l_returnflag BETWEEN 'A' AND 'N'
         |GROUP BY 1""".stripMargin,
    "q46_pruned_scan" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_partkey BETWEEN 100 AND 600
         |  AND l_suppkey BETWEEN 10 AND 60
         |GROUP BY 1""".stripMargin,
    "q45_hilbert" -> {
      val (cte, fin) = ZOrder.sqlHilbertCte(
        "l_partkey % 256", "l_suppkey % 256", bits = 8,
        table = "lineitem", carry = Seq("l_extendedprice"))
      s"""WITH $cte
         |SELECT hd >> 8 AS hcell, count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM $fin GROUP BY 1""".stripMargin
    },
    "q43_zorder" ->
      s"""SELECT ${ZOrder.sqlInterleave(
             Seq("l_partkey % 256", "l_suppkey % 256"), bits = 8)} >> 8
         |    AS zcell,
         |  count(*) AS n,
         |  ${sqlSumd("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY 1""".stripMargin,
    "qi2_rolling_trend" ->
      """WITH base AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |sums AS (
        |  SELECT event_id, user_id, ts, value,
        |    CAST(count(*) OVER f AS DOUBLE) AS n,
        |    CAST(sum(CAST(rn AS DECIMAL(18,0))) OVER f AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sy,
        |    CAST(sum(CAST(rn AS DECIMAL(18,0)) * CAST(rn AS DECIMAL(18,0)))
        |      OVER f AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(rn AS DECIMAL(18,0)) * CAST(value AS DECIMAL(18,6)))
        |      OVER f AS DOUBLE) AS sxy
        |  FROM base
        |  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts, value,
        |  CASE WHEN n * sxx - sx * sx <> 0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS trend
        |FROM sums""".stripMargin,
    "qj1_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
        |FROM events""".stripMargin,
    "q25_sessionize" ->
      """SELECT event_id, user_id, ts,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |FROM (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |        - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (
        |            PARTITION BY user_id ORDER BY ts, event_id))
        |        > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events)""".stripMargin,
    "q26_median" ->
      """SELECT l_returnflag, l_quantity AS median_qty FROM (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber, l_partkey,
        |        l_suppkey) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |WHERE rn = (cnt + 1) // 2""".stripMargin,
    "q19_rank_frames" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn,
        |  rank() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_quantity DESC, l_linenumber, l_partkey, l_suppkey) AS qty_rank,
        |  dense_rank() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_quantity DESC, l_linenumber, l_partkey, l_suppkey) AS qty_dense_rank,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_qty_3
        |FROM lineitem""".stripMargin,
    "q20_asof_join" ->
      """SELECT t.event_id, t.user_id, CAST(t.ts AS TIMESTAMP) AS ts,
        |  t.value AS trade_value, q.value AS quote_val,
        |  CAST(q.ts AS TIMESTAMP) AS quote_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') q
        |  ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin,
    "q38_asof_forward" ->
      """WITH t AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |q AS (SELECT * FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT t.event_id, t.user_id, CAST(t.ts AS TIMESTAMP) AS ts,
        |    t.value AS trade_value, q.value AS quote_val,
        |    CAST(q.ts AS TIMESTAMP) AS quote_ts,
        |    row_number() OVER (PARTITION BY t.event_id
        |      ORDER BY q.ts ASC) AS rn
        |  FROM t JOIN q ON t.user_id = q.user_id AND q.ts >= t.ts
        |    AND q.ts <= t.ts + INTERVAL 3600 SECOND)
        |SELECT event_id, user_id, ts, trade_value, quote_val, quote_ts
        |FROM m WHERE rn = 1""".stripMargin,
    "q39_asof_nearest" ->
      """WITH t AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |q AS (SELECT * FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT t.event_id, t.user_id, CAST(t.ts AS TIMESTAMP) AS ts,
        |    t.value AS trade_value, q.value AS quote_val,
        |    CAST(q.ts AS TIMESTAMP) AS quote_ts,
        |    row_number() OVER (PARTITION BY t.event_id
        |      ORDER BY (CASE WHEN q.ts <= t.ts THEN t.ts - q.ts
        |                ELSE q.ts - t.ts END) ASC,
        |               (CASE WHEN q.ts <= t.ts THEN 0 ELSE 1 END) ASC) AS rn
        |  FROM t JOIN q ON t.user_id = q.user_id)
        |SELECT event_id, user_id, ts, trade_value, quote_val, quote_ts
        |FROM m WHERE rn = 1""".stripMargin,
    "q21_range_join" ->
      """SELECT e.event_id, count(c.event_id) AS n_clicks
        |FROM events e LEFT JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        |  AND c.ts > e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id""".stripMargin,
    "q22_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q23_corr" ->
      s"""WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  ${sqlSumd("l_quantity")} AS sx,
         |  ${sqlSumd("l_extendedprice")} AS sy,
         |  ${sqlSumd("l_quantity * l_quantity")} AS sxx,
         |  ${sqlSumd("l_extendedprice * l_extendedprice")} AS syy,
         |  ${sqlSumd("l_quantity * l_extendedprice")} AS sxy
         |  FROM lineitem)
         |SELECT n,
         |  ((n * sxy - sx * sy) /
         |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
         |    AS corr_qty_price
         |FROM s""".stripMargin,
    "q24_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${sqlSumd("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "qi1_indicator_frames" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) OVER f3 AS DOUBLE)
        |    / CAST(count(value) OVER f3 AS DOUBLE) AS sma3,
        |  value - lag(value, 2) OVER w AS mom2,
        |  min(value) OVER f3 AS min3,
        |  max(value) OVER f3 AS max3
        |FROM events
        |WINDOW
        |  w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  f3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin)
}
