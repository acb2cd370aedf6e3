package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String): String = s"/root/testdata/sf0.001/$name.parquet"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Deterministic synthetic stock bars covering the full 60-column schema
  * (FIXTURES.md §1): `nDays` trading days × `minutesPerDay` minute bars,
  * seedless closed-form values so goldens are hand-computable. */
object StockFixture {
  import java.sql.Timestamp

  def bars(spark: SparkSession, nDays: Int = 5, minutesPerDay: Int = 60)
      : DataFrame = {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2020, 1, 6, 9, 30)
    val rows = for {
      d <- 0 until nDays
      m <- 0 until minutesPerDay
    } yield {
      val i = d * minutesPerDay + m
      val ts = Timestamp.valueOf(base.plusDays(d).plusMinutes(m))
      val close = 100.0 + 5.0 * math.sin(i / 7.0) + 0.01 * i
      val high = close + 0.5 + 0.1 * math.cos(i / 3.0)
      val low = close - 0.5
      val open = close - 0.1
      val volume = 1000 + (i % 97)
      (ts, close, high, low, open, volume, i.toDouble)
    }
    val df = rows.toDF("date", "close", "high", "low", "open", "volume", "i")
    // fill the 53 indicator columns with deterministic functions of i so
    // every engineered-feature formula has a hand-checkable input
    val withInd = graft.schema.StockSchema.indicatorCols
      .filterNot(Seq("close", "high", "low", "open").contains)
      .zipWithIndex.foldLeft(df) { case (acc, (c, k)) =>
        acc.withColumn(c,
          org.apache.spark.sql.functions.expr(s"close * ${1 + k % 7} + i / ${k + 2}"))
      }
    withInd.drop("i")
  }
}
