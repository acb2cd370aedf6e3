package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** LSH bucket-skew defense (r11 VERDICT ask #1, restructured r13 per
  * ask #4): oversized buckets must be dropped BEFORE `collect_list`,
  * so a saturated bucket never materialises its id list in one
  * aggregation buffer. The cap is a spill-safe window count riding the
  * collect's OWN shuffle — one exchange, no join, the banded pipeline
  * computed once. The adversarial corpus here puts 30% of all
  * documents behind ONE template text (→ one saturated bucket per
  * band); the spec asserts the cap semantically (no pairs from the
  * saturated set, planted near-dup signal intact), structurally (no
  * join in the plan — the r12 prepass+join shape recomputed the banded
  * pipeline twice) and through Spark's own SQLMetrics (the cap filter
  * passes exactly the surviving banded rows — the saturated ids
  * provably never reach an aggregation buffer). */
class LshSkewSpec extends SparkSpec {
  import spark.implicits._

  private val template =
    "lorem ipsum boilerplate template text repeated across the corpus"
  /** 1000 docs: ids 0/1 a planted near-dup pair, 2..701 unique filler,
    * 10000..10299 the 30% saturated template block. */
  private lazy val docs = {
    val planted = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy dog today"))
    val unique = (2L to 701L).map(i =>
      (i, s"unique document w${i * 7} w${i * 13 + 1} w${i * 29 + 2} " +
        s"w${i * 31 + 3} w${i * 37 + 4}"))
    val saturated = (10000L until 10300L).map(i => (i, template))
    (planted ++ unique ++ saturated).toDF("doc_id", "text")
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    LshSkewSpec.allPhysicalNodes(p)

  test("saturated bucket is dropped before collect_list: no pairs from " +
    "it, near-dup signal intact, cap-filter metric == surviving " +
    "banded rows, one shuffle and no join") {
    val cap = 50
    val pairs = Dedup.lshCandidatePairs(docs, maxBucket = Some(cap))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // semantic: the planted near-dup pair survives; the saturated block
    // contributes nothing (neither within itself nor to outsiders via
    // its buckets)
    assert(got.contains((0L, 1L)), s"planted near-dup lost: $got")
    assert(!got.exists(p => p._1 >= 10000L && p._2 >= 10000L),
      "saturated-bucket pairs leaked through the cap")

    // metrics: the window-count cap filter feeds the collect_list
    // aggregate; its output-row SQLMetric must equal the independently
    // computed count of banded rows in buckets of size (1, cap] —
    // i.e. the 4×300 saturated rows never reached an aggregation
    // buffer
    val banded = Dedup.bandedSignatures(docs)
    val survivors = banded.groupBy($"band", $"band_key")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > 1 && $"n" <= cap)
      .agg(coalesce(sum($"n"), lit(0L))).collect()(0).getLong(0)
    val totalBanded = banded.count()
    assert(totalBanded - survivors >= 4 * 300L,
      "fixture lost its saturation: the template block must dominate")
    val nodes = allNodes(pairs.queryExecution.executedPlan)
    // structure: the cap rides the collect's own shuffle — no join
    // anywhere (the r12 prepass+join shape planned one and recomputed
    // the banded pipeline on both of its sides)
    assert(!nodes.exists(_.isInstanceOf[BaseJoinExec]),
      "the window-count cap must not plan a join")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "spill-safe window count missing from the plan")
    val capFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("_bn") => f
    }
    assert(capFilters.nonEmpty, "cap filter missing from the plan")
    val filterOut = capFilters.map(_.metrics("numOutputRows").value).max
    assert(filterOut == survivors,
      s"collect_list consumed $filterOut rows, expected $survivors " +
        "(saturated ids reached the aggregation buffer)")
  }

  test("cap disabled restores the full quadratic contract") {
    val got = Dedup.lshCandidatePairs(docs, maxBucket = None)
      .filter($"id_a" >= 10000L && $"id_b" >= 10000L).count()
    assert(got == 300L * 299L / 2,
      s"expected all C(300,2) saturated pairs, got $got")
  }

  test("the cap is ON by default at DefaultMaxBucket") {
    // 1100 identical docs exceed the 1000 default; the default call
    // drops them while keeping a planted near-dup pair
    val big = ((20000L until 21100L).map(i => (i, template)) ++ Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy dog today")))
      .toDF("doc_id", "text")
    val got = Dedup.lshCandidatePairs(big).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)),
      s"default cap must keep only the planted pair, got ${got.size} pairs")
  }

  test("dupClusters inherits the cap: saturated block stays unclustered") {
    val clusters = Dedup.dupClusters(docs, maxBucket = Some(50))
      .filter($"doc_id" >= 10000L)
      .filter($"cluster_id" =!= $"doc_id").count()
    assert(clusters == 0L,
      "capped saturated docs must label themselves (no pairs, no cluster)")
  }
}

object LshSkewSpec {
  /** All physical nodes under `p`, through AQE wrappers — shared by the
    * skew-guard specs that read join SQLMetrics off executed plans. */
  def allPhysicalNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allPhysicalNodes(a.executedPlan)
    case q: QueryStageExec => q +: allPhysicalNodes(q.plan)
    case other => other +: other.children.flatMap(allPhysicalNodes)
  }
}
