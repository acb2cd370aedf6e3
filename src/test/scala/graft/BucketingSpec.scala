package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("bucketed-bucketed join plans with zero exchanges") {
    val orders = spark.read.parquet(sf("orders"))
    val lineitem = spark.read.parquet(sf("lineitem"))
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 8)
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(spark, "b_orders")
        .join(Bucketing.readTable(spark, "b_lineitem"), Seq("o_orderkey"))
      assert(exchanges(joined) == 0,
        s"expected co-located join:\n${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      val n = joined.count()
      val expected = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        Seq("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val lineitem = spark.read.parquet(sf("lineitem"))
    Bucketing.writeBucketed(lineitem, "b_li_agg", Seq("l_orderkey"), 8)
    try {
      val agg = Bucketing.readTable(spark, "b_li_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      assert(exchanges(agg) == 0,
        s"expected shuffle-free agg:\n${agg.queryExecution.executedPlan}")
    } finally spark.sql("DROP TABLE IF EXISTS b_li_agg")
  }
}
