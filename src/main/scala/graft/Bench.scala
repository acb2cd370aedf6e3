package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every catalog query on
  * `SPARK_GRAFT_SF_DIR`, plus the end-to-end pipeline cells that mirror
  * BASELINE.md's published runtimes at the reference's own scale
  * (671,024×60 synthetic bars; disable with SPARK_GRAFT_E2E=0). Emits ONE
  * JSON line.
  *
  * E2E cells are measured two ways, because interleaved numbers proved
  * noisy across rounds (a cell can inherit multi-second GC debt from the
  * ML cell before it — ±40% observed):
  *  - interleaved (key `e2e_X`): all cells sequentially in the shared
  *    session, as rounds 1–3 measured them — kept for trend continuity;
  *  - isolated (key `e2e_X_iso`): each cell in a FRESH SparkSession
  *    (own SparkContext — broadcast/block-manager state from prior cells
  *    gone), the cell's real input page-cache pre-touched untimed in
  *    that session (r7 ask #1 — a scale run's multi-GB replica can
  *    evict it between cells), forced GC before each rep, median of
  *    `SPARK_GRAFT_E2E_REPS` (default 5) reps — widened by 2 extra
  *    reps whenever the base spread exceeds 1.5× (r6 ask #7), so no
  *    single page-cache/draw outlier can move the median. A trimmed
  *    mean (drop one min + one max) rides along as `e2e_X_iso_tmean`.
  *    The PCA cells additionally run PREPARED (r11 ask #4,
  *    `E2EBench.isoPrepared`): their labeled-frame cache — the one
  *    page-cache-sensitive term the r11 phase probe isolated — is
  *    materialized once per session, untimed, so the timed reps
  *    measure the fits at steady state; the interleaved key keeps the
  *    full label+fit cost.
  *    These are the authoritative per-cell numbers for BASELINE
  *    comparison. Scale mains (CatalogScale/E2EScale/DmlChurnScale)
  *    must run in a SEPARATE invocation AFTER this artifact is
  *    written — their replicas evict the page cache.
  * `SPARK_GRAFT_E2E_MODE` = both (default) | interleaved | isolated.
  * The `total` metric stays interleaved-only so it remains comparable
  * with BENCH_r01–r03.
  *
  * Failures are reported distinctly (ADVICE r4): a query/cell that throws
  * records `null` under `queries` plus an entry in `errors` — never a
  * misleading time-to-failure masquerading as a measurement.
  *
  * The full result also lands as a pretty-printed committed artifact
  * (`BENCH_FULL_r{N}.json`, N = max existing BENCH_r* + 1, overridable via
  * `SPARK_GRAFT_BENCH_FULL`): the driver's per-round capture truncates to
  * ~65 of the ~120 entries, which ate the one number that mattered in r4.
  * Skipped when `SPARK_GRAFT_ONLY` filters the run (partial results would
  * clobber the full artifact).
  */
object Bench {

  /** A cell/query outcome: elapsed seconds, or the failure message. */
  private type Timing = Either[String, Double]

  private def buildSession(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(body: => Unit): Timing = {
    val t0 = System.nanoTime()
    try { body; Right((System.nanoTime() - t0) / 1e9) }
    catch {
      case t: Throwable =>
        Left(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(200)}")
    }
  }

  /** Untimed full read of every input a timed query can touch —
    * page-cache pre-touch (r7 VERDICT ask #1): a fresh session (or a
    * cache evicted by an earlier scale run's multi-GB replica) would
    * otherwise charge cold-read I/O to whichever timed rep runs
    * first, and the rep spread reads as compute noise. */
  private def preTouch(s: SparkSession, paths: Seq[String]): Unit =
    paths.foreach { p =>
      try s.read.parquet(p).queryExecution.toRdd.count(): Unit
      catch { case _: Throwable => () }
    }

  private val SfTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runE2e = sys.env.getOrElse("SPARK_GRAFT_E2E", "1") != "0"
    val e2eMode = sys.env.getOrElse("SPARK_GRAFT_E2E_MODE", "both")
    // 5 base reps (r7 VERDICT ask #1): median-of-5 tolerates two
    // outliers and the trimmed mean below is only meaningful at ≥ 5
    val e2eReps = sys.env.getOrElse("SPARK_GRAFT_E2E_REPS", "5").toInt
    // optional comma-separated query-name filter for spot measurements
    // (applies to catalog queries AND e2e cells)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = buildSession(cpus)
    // warmup: JIT + filesystem caches, so the first timed query isn't
    // charged for session spin-up
    try { SparkEntry.entry(spark).queryExecution.toRdd.count() }
    catch { case _: Throwable => () }
    // page-cache the bench-scale inputs before ANY timed query
    preTouch(spark, SfTables.map(n => s"$sfDir/$n.parquet"))
    // first-use class-load/JIT costs measured at multiple seconds each
    // land in whichever timed query runs the path first (r5/r6 root
    // causes: fe_faithful 77 s cold, qt11 +3 s, qs5 5.8→1.9 s steady,
    // qv15 6.9→2.7 s). Pay each family's compilation once, untimed, at
    // the smallest SF so timed queries measure steady-state data-plane
    // work: complete-mode streaming (qs1), append/watermark streaming
    // (qs5), minhash/LSH + CC (qt11), IVF-PQ codegen (qv15). Filtered
    // spot runs skip warmups for families they never time; a renamed
    // warmup key fails LOUDLY (a silently-skipped warmup would quietly
    // put the JIT cost back into the first timed query — the exact
    // regression this warmup prevents).
    Seq("qs1_stream_daily" -> "qs", "qs5_stream_append_daily" -> "qs",
      "qt11_dup_clusters" -> "qt", "qv15_ivfpq_query" -> "qv")
      .foreach { case (w, family) =>
        require(SparkEntry.queries.contains(w),
          s"bench warmup query '$w' is gone from the catalog — rename " +
            "it here or its family loses JIT warmup")
        if (only.forall(_.exists(_.startsWith(family)))) {
          try {
            SparkEntry.queries(w)(spark, "/root/testdata/sf0.001")
              .queryExecution.toRdd.count()
            spark.sharedState.cacheManager.clearCache()
          } catch {
            case scala.util.control.NonFatal(e) => System.err.println(
              s"[bench] warmup $w failed (family loses warmup): $e")
          }
        }
      }
    val results: Map[String, Timing] = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // toRdd.count() executes the full physical plan including the final
      // projection — a plain count() would let Catalyst prune every
      // projection-only query down to a row count
      val t = time { fn(spark, sfDir).queryExecution.toRdd.count(): Unit }
      // isolate measurements: drop caches the query left behind
      spark.sharedState.cacheManager.clearCache()
      name -> t
    }
    var interleaved = Map.empty[String, Timing]
    var isolated = Map.empty[String, Timing]
    // per-rep iso times for the committed artifact: medians alone made
    // the r5 svm_pca 26 s-vs-49 s builder/driver discrepancy
    // unadjudicable (VERDICT r5 ask #3) — with the reps in the artifact,
    // variance vs level-shift is readable from the JSON itself
    var isoReps = Map.empty[String, Seq[Timing]]
    if (runE2e) {
      // deterministic cell order (Map iteration order is not)
      val cells = bench.E2EBench.cells.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
      val path = bench.SyntheticBars.ensure(spark) // untimed, write-once
      if (e2eMode != "isolated") {
        interleaved = cells.map { case (name, fn) =>
          val t = time { fn(spark, path): Unit }
          spark.sharedState.cacheManager.clearCache()
          name -> t
        }.toMap
      }
      spark.stop()
      if (e2eMode != "interleaved") {
        isolated = cells.flatMap { case (name, fn) =>
          val s = buildSession(cpus)
          try {
            // untimed small-scale warmup: the first execution of a cell
            // in a JVM pays its Catalyst-analysis + codegen JIT cost —
            // measured 77 s cold vs 22 s warm for the 13-join faithful
            // cell, the whole r4 "creep" (the cell code was unchanged).
            // One tiny run compiles those paths so the timed reps
            // measure data-plane work, protocol-independently.
            val warmPath = bench.SyntheticBars.ensure(s, 20000)
            try { fn(s, warmPath): Unit } catch { case _: Throwable => () }
            s.sharedState.cacheManager.clearCache()
            // one untimed FULL read of the cell's real input in this
            // fresh session (r7 ask #1): without it the first rep pays
            // any page-cache eviction — e.g. a preceding scale run's
            // 3 GB replica — and the rep spread widens spuriously
            preTouch(s, Seq(path))
            // prepared cells (r11 ask #4): materialize the
            // page-cache-sensitive labeled cache once, untimed; the
            // timed reps then measure the fits. No session-wide
            // clearCache between this cell's warms/reps — it would
            // drop the prepared cache; the cell body unpersists
            // everything IT creates (E2EBench.isoPrepared scaladoc).
            val prep = bench.E2EBench.isoPrepared.get(name)
              .map(p => p(s, path))
            val repBody: () => Unit = prep match {
              case Some((body, _)) => () => { body(): Unit }
              case None => () => { fn(s, path): Unit }
            }
            // ... and THREE untimed FULL-SCALE executions: the 20k-row
            // warmup compiles the plan paths but not the full-scale
            // JIT tier (treeAggregate inner loops, BLAS dispatch),
            // and C2 compilation is ASYNC — a single warm run leaves
            // its compile queue draining into the first timed rep
            // (measured r8: rep 1 at 2-3× with one warm run — 21.5
            // vs 7.6-8.5 steady). TWO warms still left one residual
            // rep-1 draw (r8's e2e_svm_raw: 19.1 s rep 1 vs 8.4-9.9
            // steady — LinearSVC's treeAggregate occasionally
            // compiles a late tier), hence the third (r8 ask #7).
            // Timed reps measure STEADY STATE — the cluster-relevant
            // number, where every executor outlives its first task
            // by hours
            (1 to 3).foreach { _ =>
              try repBody() catch { case _: Throwable => () }
              if (prep.isEmpty) s.sharedState.cacheManager.clearCache()
            }
            def oneRep(): Timing = {
              if (prep.isEmpty) s.sharedState.cacheManager.clearCache()
              System.gc()
              time { repBody() }
            }
            val baseReps = (1 to math.max(1, e2eReps)).map(_ => oneRep())
            // adaptive widening (VERDICT r6 ask #7): when the base
            // reps spread past 1.5x (page cache through a fresh
            // session + treeAggregate draw variance — the r6
            // svm_pca/rf_mllib cells), the median of 3 is one outlier
            // away from a level shift; two more reps make the median
            // robust to any single outlier and the committed per-rep
            // array shows WHY the cell widened
            val okBase = baseReps.collect { case Right(v) => v }
            val reps =
              if (okBase.nonEmpty &&
                  okBase.max / math.max(okBase.min, 1e-9) > 1.5)
                baseReps ++ (1 to 2).map(_ => oneRep())
              else baseReps
            // release the prepared labeled cache now that the cell's
            // reps are done (the session stop below would reclaim it
            // anyway, but the harness shouldn't rely on that)
            prep.foreach { case (_, cleanup) => cleanup() }
            isoReps += (name + "_iso") -> reps
            val (errs, times) = (reps.collect { case Left(e) => e },
              reps.collect { case Right(v) => v }.sorted)
            if (times.isEmpty) Seq((name + "_iso") -> (Left(errs.head): Timing))
            else {
              // true median: average the two middle elements on even reps
              val mid = times.length / 2
              val median = if (times.length % 2 == 1) times(mid)
                else (times(mid - 1) + times(mid)) / 2
              // trimmed mean (drop one min + one max, r7 ask #1):
              // robust like the median but uses the middle reps'
              // information instead of one draw — reported beside the
              // median so level shifts and outliers separate in the
              // artifact
              val tmean =
                if (times.length >= 3) {
                  val core = times.drop(1).dropRight(1)
                  core.sum / core.length
                } else times.sum / times.length
              Seq((name + "_iso") -> (Right(median): Timing),
                (name + "_iso_tmean") -> (Right(tmean): Timing))
            }
          } finally s.stop()
        }.toMap
      }
    } else spark.stop()
    val all = results ++ interleaved ++ isolated
    val qs = all.toSeq.sortBy(_._1).map {
      case (k, Right(v)) => jsonStr(k) + ":" + v
      case (k, Left(_)) => jsonStr(k) + ":null"
    }.mkString("{", ",", "}")
    val errs = all.toSeq.sortBy(_._1).collect {
      case (k, Left(e)) => jsonStr(k) + ":" + jsonStr(e)
    }.mkString("{", ",", "}")
    // interleaved-only total, comparable with rounds 1-3; failures excluded
    val total = (results ++ interleaved).values
      .collect { case Right(v) => v }.sum
    // per-rep iso times ride along on the one-line JSON too: filtered
    // spot runs (SPARK_GRAFT_ONLY) skip the full artifact, and those
    // are exactly the runs used to investigate variance
    val repsJson = isoReps.toSeq.sortBy(_._1).map { case (k, rs) =>
      jsonStr(k) + ":[" + rs.map {
        case Right(v) => v.toString
        case Left(e) => jsonStr(e)
      }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repsJson,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // full committed artifact — one key per line so round-over-round git
    // diffs stay readable; only for unfiltered runs
    if (only.isEmpty) {
      val fullOut = sys.env.get("SPARK_GRAFT_BENCH_FULL").getOrElse {
        // the driver writes BENCH_r{N}.json after each round's run, so at
        // run time the CURRENT round is max existing + 1 (re-runs within a
        // round overwrite the same artifact — intended)
        val rx = "BENCH_r(\\d+)\\.json".r
        val seen = Option(new java.io.File(".").listFiles()).toSeq.flatten
          .flatMap(f => rx.findFirstMatchIn(f.getName).map(_.group(1).toInt))
        val n = if (seen.isEmpty) 1 else seen.max + 1
        f"BENCH_FULL_r$n%02d.json"
      }
      val body = new StringBuilder
      body ++= "{\n"
      body ++= s"""  "metric": "total",\n  "value": $total,\n  "unit": "sec",\n  "sf": ${jsonStr(sfDir)},\n"""
      body ++= "  \"queries\": {\n"
      body ++= all.toSeq.sortBy(_._1).map {
        case (k, Right(v)) => s"    ${jsonStr(k)}: $v"
        case (k, Left(_)) => s"    ${jsonStr(k)}: null"
      }.mkString(",\n")
      body ++= "\n  },\n  \"reps\": {\n"
      // raw per-rep iso outcomes, in run order (NOT sorted): rep-1-vs-
      // rep-3 drift (cache warming, JIT residue) stays visible
      body ++= isoReps.toSeq.sortBy(_._1).map { case (k, rs) =>
        s"    ${jsonStr(k)}: [" + rs.map {
          case Right(v) => v.toString
          case Left(e) => jsonStr(e)
        }.mkString(", ") + "]"
      }.mkString(",\n")
      body ++= "\n  },\n  \"errors\": {\n"
      body ++= all.toSeq.sortBy(_._1).collect {
        case (k, Left(e)) => s"    ${jsonStr(k)}: ${jsonStr(e)}"
      }.mkString(",\n")
      body ++= "\n  }\n}\n"
      val w = new java.io.PrintWriter(fullOut, "UTF-8")
      try w.print(body.toString) finally w.close()
    }
  }
}
