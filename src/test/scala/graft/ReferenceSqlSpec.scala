package graft

import org.apache.spark.sql.functions._

import graft.operators.{DailyAggregates, Labeler}
import graft.sql.ReferenceSql

class ReferenceSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bars = StockFixture.bars(spark, nDays = 3,
    minutesPerDay = 40)

  test("verbatim W1 SQL equals the Labeler operator") {
    ReferenceSql.register(bars)
    val viaSql = ReferenceSql.label(spark)
      .withColumn("buy_or_sell",
        when($"next_high" > $"high", 1).otherwise(0))
      .orderBy("date").select($"buy_or_sell").as[Int].collect().toSeq
    val viaOp = Labeler.label(bars)
      .orderBy("date").select($"buy_or_sell").as[Int].collect().toSeq
    assert(viaSql == viaOp)
  }

  test("verbatim A1 SQL equals the DailyAggregates compat operator") {
    ReferenceSql.register(DailyAggregates.withDateOnly(bars))
    val viaSql = ReferenceSql.avgClose(spark)
      .orderBy("date_only")
      .select($"avg_close").as[Double].collect().toSeq
    val viaOp = DailyAggregates.avgCloseCompat(bars)
      .orderBy("date_only")
      .select($"avg_close").as[Double].collect().toSeq
    assert(viaSql.zip(viaOp).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("verbatim A2 SQL is one row per day, ordered") {
    ReferenceSql.register(
      DailyAggregates.withDateOnly(bars).withColumn("momentum", $"close"))
    val out = spark.sql(ReferenceSql.dailyAvgSql("momentum"))
    val days = out.select($"date_only").collect().map(_.get(0))
    assert(days.length == 3 && days.toSeq == days.sorted(
      Ordering.by((d: Any) => d.toString)).toSeq)
  }
}
