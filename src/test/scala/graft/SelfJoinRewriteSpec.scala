package graft

import org.apache.spark.sql.functions._

class SelfJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val flag = "spark.graft.rewriteSelfJoin.assumeUniqueKeys"

  // parquet-backed (a LocalRelation fixture would be constant-folded
  // before the rule runs); o_orderkey is unique — the rule's contract
  private def j3Frame() = {
    val df = spark.read.parquet(sf("orders"))
      .select($"o_orderkey", $"o_totalprice", $"o_custkey")
    // the reference's J3 shape: join back a projection of the same frame
    df.join(df.select($"o_orderkey",
      ($"o_totalprice" * 0.9).as("x")), Seq("o_orderkey"))
  }

  private def countJoins(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size

  test("rule off (default): the self-join stays a join") {
    GraftExtensions.register(spark)
    spark.conf.set(flag, "false")
    assert(countJoins(j3Frame()) == 1)
  }

  test("rule on: J3 self-join collapses to a projection, same values") {
    GraftExtensions.register(spark)
    spark.conf.set(flag, "true")
    try {
      val collapsed = j3Frame()
      assert(countJoins(collapsed) == 0,
        s"join not collapsed:\n${collapsed.queryExecution.optimizedPlan}")
      // values must equal the withColumn equivalent
      val viaProjection = spark.read.parquet(sf("orders"))
        .select($"o_orderkey", $"o_totalprice", $"o_custkey")
        .withColumn("x", $"o_totalprice" * 0.9)
      assert(collapsed.orderBy("o_orderkey").collect().toSeq ==
        viaProjection.orderBy("o_orderkey").collect().toSeq)
    } finally spark.conf.set(flag, "false")
  }

  test("rule on: non-self joins are untouched") {
    GraftExtensions.register(spark)
    spark.conf.set(flag, "true")
    try {
      val a = Seq((1L, "x")).toDF("k", "s")
      val b = Seq((1L, 2.0)).toDF("k", "v")
      assert(countJoins(a.join(b, Seq("k"))) == 1)
    } finally spark.conf.set(flag, "false")
  }
}
