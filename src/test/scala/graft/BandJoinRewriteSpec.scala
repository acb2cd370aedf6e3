package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** [[graft.plans.BandJoinRewrite]]: a small-integer band join must become
  * an exploded equi-join — same rows, no nested-loop/cartesian physical
  * join — and must leave everything it can't prove alone. */
class BandJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val flag = "spark.graft.rewriteBandJoin.enabled"

  // parquet-backed so LocalRelation constant-folding can't pre-join;
  // ids dense 0..N with some duplicate values and a NULL key row
  private def frames(): (DataFrame, DataFrame) = {
    val a = spark.read.parquet(sf("orders"))
      .select($"o_orderkey".as("ka"), $"o_custkey".as("va")).limit(500)
      .union(spark.sql("SELECT CAST(NULL AS BIGINT) AS ka, 1L AS va"))
    val b = spark.read.parquet(sf("orders"))
      .select($"o_orderkey".as("kb"), $"o_totalprice".as("vb")).limit(500)
    (a, b)
  }

  // string-level count: AQE wraps the tree in AdaptiveSparkPlanExec,
  // which collect() does not descend into (same approach as PlanAudit)
  private def nestedLoopOrCartesian(plan: SparkPlan): Int = {
    val s = plan.toString
    "BroadcastNestedLoopJoin|CartesianProduct".r
      .findAllIn(s).size
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withRule[T](on: Boolean)(f: => T): T = {
    GraftExtensions.register(spark)
    spark.conf.set(flag, on.toString)
    try f finally spark.conf.set(flag, "true")
  }

  test("band join rewrites: no nested loop, rows identical to rule-off") {
    val (a, b) = frames()
    def q = a.join(b, $"kb" >= $"ka" + 1 && $"kb" <= $"ka" + 5)
    val off = withRule(false)(sortedRows(q))
    withRule(true) {
      assert(nestedLoopOrCartesian(q.queryExecution.executedPlan) == 0,
        s"nested loop survived:\n${q.queryExecution.executedPlan}")
      assert(sortedRows(q) == off)
    }
  }

  test("strict bounds and swapped operand order normalise correctly") {
    val (a, b) = frames()
    // kb > ka && ka + 6 > kb  ≡  delta ∈ [1, 5]
    def strict = a.join(b, $"kb" > $"ka" && $"ka" + 6 > $"kb")
    def closed = a.join(b, $"kb" >= $"ka" + 1 && $"kb" <= $"ka" + 5)
    val expected = withRule(false)(sortedRows(closed))
    withRule(true) {
      assert(nestedLoopOrCartesian(strict.queryExecution.executedPlan) == 0)
      assert(sortedRows(strict) == expected)
    }
  }

  test("extra conjuncts survive; tightest of several bounds wins") {
    val (a, b) = frames()
    def q = a.join(b, $"kb" >= $"ka" + 1 && $"kb" >= $"ka" - 3 &&
      $"kb" <= $"ka" + 4 && $"va" =!= $"vb")
    val off = withRule(false)(sortedRows(q))
    withRule(true) {
      assert(nestedLoopOrCartesian(q.queryExecution.executedPlan) == 0)
      assert(sortedRows(q) == off)
    }
  }

  test("left-shifted form: bounds written on the left attribute") {
    val (a, b) = frames()
    // ka ≤ kb − ... written as ka + c cmp kb from the left side
    def q = a.join(b, $"ka" + 1 <= $"kb" && $"ka" + 5 >= $"kb")
    val off = withRule(false)(sortedRows(q))
    withRule(true) {
      assert(nestedLoopOrCartesian(q.queryExecution.executedPlan) == 0)
      assert(sortedRows(q) == off)
    }
  }

  test("subtract-form lower bound rewrites: kb >= ka - 5 && kb <= ka + 5") {
    val (a, b) = frames()
    def q = a.join(b, $"kb" >= $"ka" - 5 && $"kb" <= $"ka" + 5)
    val off = withRule(false)(sortedRows(q))
    withRule(true) {
      assert(nestedLoopOrCartesian(q.queryExecution.executedPlan) == 0,
        "the symmetric-window form must rewrite")
      assert(sortedRows(q) == off)
    }
  }

  test("overflow safety: extreme literal constants leave the join " +
    "untouched and never fail planning") {
    val (a, b) = frames()
    withRule(true) {
      // bound arithmetic past the Long range: width computation must
      // not wrap into the <= maxWidth window
      val huge = a.join(b, $"kb" >= $"ka" - 5000000000000000000L &&
        $"kb" <= $"ka" + 5000000000000000000L)
      assert(nestedLoopOrCartesian(huge.queryExecution.executedPlan) >= 1)
      // strict bound at Long.MaxValue: the +1 shift must bail, not wrap
      // into lo = Long.MinValue. (Spark itself then folds the
      // contradictory x > c && x <= c condition to an empty relation,
      // so the observable contract is: planning succeeds, zero rows.)
      val edge = a.join(b, $"kb" > $"ka" + Long.MaxValue &&
        $"kb" <= $"ka" + Long.MaxValue)
      assert(edge.count() == 0)
    }
  }

  test("int32 keys never rewrite (wrap semantics near 2^31 differ)") {
    val (a0, b0) = frames()
    val a = a0.select($"ka".cast("int").as("ka"), $"va")
    val b = b0.select($"kb".cast("int").as("kb"), $"vb")
    withRule(true) {
      val q = a.join(b, $"kb" >= $"ka" + 1 && $"kb" <= $"ka" + 5)
      assert(nestedLoopOrCartesian(q.queryExecution.executedPlan) >= 1,
        "int keys must stay on the nested-loop path")
    }
  }

  test("does not fire: half-open band, too-wide band, non-integer keys") {
    val (a, b) = frames()
    withRule(true) {
      // only a lower bound — no finite band
      val half = a.join(b, $"kb" >= $"ka" + 1)
      assert(nestedLoopOrCartesian(half.queryExecution.executedPlan) >= 1)
      // band wider than maxWidth (default 64)
      val wide = a.join(b, $"kb" >= $"ka" + 1 && $"kb" <= $"ka" + 1000)
      assert(nestedLoopOrCartesian(wide.queryExecution.executedPlan) >= 1)
      // double keys: arithmetic-on-floats is not a safe integer band
      val da = a.select($"ka".cast("double").as("ka"), $"va")
      val db = b.select($"kb".cast("double").as("kb"), $"vb")
      val dbl = da.join(db, $"kb" >= $"ka" + 1 && $"kb" <= $"ka" + 5)
      assert(nestedLoopOrCartesian(dbl.queryExecution.executedPlan) >= 1)
    }
  }

  test("empty band (hi < lo) left untouched, returns zero rows") {
    val (a, b) = frames()
    withRule(true) {
      val q = a.join(b, $"kb" >= $"ka" + 5 && $"kb" <= $"ka" + 1)
      assert(q.count() == 0)
    }
  }

  test("property: random bounds and random comparison encodings " +
    "always row-match rule-off, and always kill the nested loop") {
    import org.apache.spark.sql.Column
    val (a, b) = frames()
    val rnd = new scala.util.Random(20260813)
    // four syntactic encodings per bound; all mean delta >= lo / <= hi
    def lower(lo: Int, enc: Int): Column = enc match {
      case 0 => $"kb" >= $"ka" + lo
      case 1 => $"ka" + lo <= $"kb"
      case 2 => $"kb" > $"ka" + (lo - 1)
      case 3 => $"ka" + (lo - 1) < $"kb"
    }
    def upper(hi: Int, enc: Int): Column = enc match {
      case 0 => $"kb" <= $"ka" + hi
      case 1 => $"ka" + hi >= $"kb"
      case 2 => $"kb" < $"ka" + (hi + 1)
      case 3 => $"ka" + (hi + 1) > $"kb"
    }
    for (_ <- 1 to 8) {
      val lo = rnd.nextInt(13) - 6 // [-6, 6]
      val hi = lo + rnd.nextInt(7) // width 1..7
      val (encL, encU) = (rnd.nextInt(4), rnd.nextInt(4))
      def q = a.join(b, lower(lo, encL) && upper(hi, encU))
      val off = withRule(false)(sortedRows(q))
      withRule(true) {
        assert(nestedLoopOrCartesian(q.queryExecution.executedPlan) == 0,
          s"[lo=$lo hi=$hi] nested loop survived")
        assert(sortedRows(q) == off, s"[lo=$lo hi=$hi] rows differ")
      }
    }
  }
}
