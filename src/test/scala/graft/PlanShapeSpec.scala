package graft

/** Plan-shape regressions for the optimizer traps documented in the
  * verify skill: predicate pushdown cloning expensive projections into
  * Filters (the qv5 fence), and the q26 median histogram plan. */
class PlanShapeSpec extends SparkSpec {

  test("qv5 fence: threshold Filter references the sim column, not the cosine") {
    val df = graft.queries.VectorQueryCatalog
      .defs("qv5_embed_dedup")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    val filterLines = plan.linesIterator.filter(_.contains("Filter")).toList
    // the similarity threshold must filter on the projected attribute;
    // a pushed-down clone would inline the decimal cosine (an aggregate(
    // zip_with(...)) expression tree) into the Filter condition
    assert(filterLines.nonEmpty, plan)
    assert(!filterLines.exists(l => l.contains("> 0.2") && l.contains("aggregate(")),
      s"cosine cloned into Filter:\n$plan")
  }

  test("q26 median: the full table aggregates before any window sort") {
    val df = graft.queries.ExtendedQueries
      .defs("q26_median")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // histogram plan: a hash aggregate below the window; the window's
    // input is the (group, value) histogram, never the raw scan
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"expected HashAggregate below Window:\n$plan")
  }
}
