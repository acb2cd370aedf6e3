package graft

/** The scale gate: no catalog query may plan an `Exchange
  * SinglePartition` unless it is in the documented allowlist (1-row
  * global aggregates and tiny-result presentation stages). A regression
  * here means some query funnels the dataset through one task — the
  * exact failure mode that made round-1 e2e training single-core. */
class PlanAuditSpec extends SparkSpec {

  test("no undocumented single-partition exchanges in the catalog") {
    val audits = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(audits.size == SparkEntry.queries.size,
      "audit must cover every catalog query exactly once")
    val failed = audits.filter(_.error.isDefined)
    assert(failed.isEmpty, "queries failed to plan: " +
      failed.map(a => s"${a.name} (${a.error.get})").mkString("; "))
    val offenders = audits
      .filter(a => a.singlePartition > 0 &&
        !PlanAudit.singlePartitionAllowlist.contains(a.name))
      .map(_.name)
    assert(offenders.isEmpty,
      s"single-partition exchange outside allowlist: $offenders")
  }

  test("driver contract: every query has an oracle except the ML " +
    "rows-only four; no orphan oracle SQL") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
      s"oracle SQL without a query: ${oracles -- queries}")
    val rowsOnly = queries -- oracles
    assert(rowsOnly == Set("qm1_rf_confusion", "qm2_pca_variance",
      "qm3_svm_confusion", "qm4_corr_matrix"),
      s"unexpected rows-only queries (add oracle SQL or justify): " +
        s"$rowsOnly")
  }
}
