package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: for every catalog query, count the physical-plan features
  * that decide 100 TB behaviour — shuffles, broadcasts, single-partition
  * exchanges, whole-stage-codegen spans, pushed filters — and print one
  * markdown table (redirect to PLANS.md).
  *
  * `Exchange SinglePartition` is the scale red flag: it serialises the
  * whole dataset through one task. The only legitimate occurrences are
  * (a) global scalar aggregates (output is one row — the exchange moves
  * a handful of partial-agg rows, not data) and (b) final presentation
  * sorts of tiny results. `PlanAuditSpec` enforces exactly that: any
  * query with a single-partition exchange must be in the documented
  * allowlist.
  */
object PlanAudit {

  final case class Audit(
      name: String,
      exchanges: Int,
      broadcasts: Int,
      singlePartition: Int,
      codegenSpans: Int,
      pushedFilters: Boolean,
      error: Option[String] = None)

  /** Queries whose plan legitimately carries a single-partition exchange:
    * 1-row global aggregates and tiny-result presentation sorts. */
  val singlePartitionAllowlist: Set[String] = Set(
    "q12_null_guard", // 1-row count compare
    "q14_summary", // summary() over a handful of stat rows
    "q15_moments", // 1-row global moments
    "q23_corr", // 1-row global correlation
    "q32_approx_agg", // 1-row sketch-vs-exact
    "q33_profile", // 1-row multi-distinct aggregate, unpivoted after
    "q36_freq_items", // 1-row global frequent-items sketch
    "q9_daily_avg", // ORDER BY of ~30 daily rows (A2 compat shape)
    // GlobalWindow's small-input fast path (stats-gated, 64 MiB default)
    // legitimately uses one unpartitioned window at audit scale; the
    // large-input plan is asserted single-partition-free in
    // GlobalWindowSpec with the fast path disabled.
    "q7_window_lag",
    "q40_lag_k", // same fast path as q7, at offset 3
    "q41_rolling_global", // same fast path, rows-frame aggregates
    "q42_range_global", // same fast path, range-frame aggregates
    "q49_centered_global", // same fast path, both-sided rows frame
    "q10_avg_prev_day",
    "q26_median", // final rank filter over the tiny histogram
    "qv1_knn", // global top-k: TakeOrdered final stage
    "qv6_ivf_query", // global top-k over probed buckets
    "qv18_indexed_knn", // same top-k shape, served from the stored index
    "qv19_indexed_filtered_knn", // filtered stored-index top-k
    "qs21_stream_vector_index", // stored-index top-k after streaming upkeep
    "qm2_pca_variance", "qm4_corr_matrix", // driver-built 1-row frames
    // 1-row global MIN/MAX whose DV'd-file gap scan must aggregate
    // (q63's clean-lake twin answers from metadata literals alone)
    "q73_dv_meta_minmax",
    "qt11_dup_clusters", // converged-label broadcast join build side
    "qt20_top_tfidf", // 1-row corpus-count aggregate (broadcast N)
    // 1-row global (total, ssum) over the 5-row per-domain counts —
    // the broadcast rate table's build side, metadata-scale by
    // construction (input = one row per domain)
    "qt29_mixture_sample"
  )

  /** One row per catalog query, always — a query that fails to plan
    * becomes an explicit error row instead of silently vanishing from
    * the single-partition gate (fatal errors still propagate). */
  def audit(spark: SparkSession, sfDir: String): Seq[Audit] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        Audit(
          name,
          "Exchange hashpartitioning".r.findAllIn(plan).size +
            "Exchange rangepartitioning".r.findAllIn(plan).size,
          "BroadcastExchange".r.findAllIn(plan).size,
          "Exchange SinglePartition".r.findAllIn(plan).size,
          "\\*\\(\\d+\\)".r.findAllIn(plan).map(_.toString).toSet.size,
          plan.contains("PushedFilters: [") &&
            !plan.contains("PushedFilters: []"))
      } catch {
        case scala.util.control.NonFatal(e) =>
          Audit(name, 0, 0, 0, 0, pushedFilters = false,
            error = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
      finally spark.sharedState.cacheManager.clearCache()
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = audit(spark, sfDir)
    println("| query | shuffles | broadcasts | 1-part exchanges | codegen spans | pushed filters |")
    println("|---|---|---|---|---|---|")
    rows.foreach { a =>
      val flag =
        if (a.error.isDefined) s" ✗ ${a.error.get}"
        else if (a.singlePartition > 0 &&
          !singlePartitionAllowlist.contains(a.name)) " ⚠"
        else ""
      println(s"| ${a.name}$flag | ${a.exchanges} | ${a.broadcasts} | " +
        s"${a.singlePartition} | ${a.codegenSpans} | ${a.pushedFilters} |")
    }
    spark.stop()
  }
}
