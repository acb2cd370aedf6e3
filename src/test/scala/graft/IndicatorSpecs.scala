package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.indicators.{Indicators, RecursiveIndicators, RecursiveSmooth}

class IndicatorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val series = Seq(
    ("A", 1, 10.0), ("A", 2, 12.0), ("A", 3, 11.0), ("A", 4, 13.0),
    ("A", 5, 14.0),
    ("B", 1, 100.0), ("B", 2, 90.0), ("B", 3, 95.0)
  ).toDF("symbol", "t", "close")

  private val w = Indicators.symbolWindow("symbol", "t")

  test("custom ema aggregate matches the hand recurrence per symbol") {
    val alpha = 0.5
    val out = series
      .withColumn("ema", RecursiveSmooth.smooth($"close", alpha)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("symbol", "t")
      .select($"symbol", $"ema").as[(String, Double)].collect()
    // A: 10; .5*12+.5*10=11; .5*11+.5*11=11; .5*13+.5*11=12; .5*14+.5*12=13
    assert(out.filter(_._1 == "A").map(_._2).toSeq ==
      Seq(10.0, 11.0, 11.0, 12.0, 13.0))
    // B: 100; 95; 95
    assert(out.filter(_._1 == "B").map(_._2).toSeq == Seq(100.0, 95.0, 95.0))
  }

  test("ema aggregate == mapPartitions twin on the fixture bars") {
    val bars = StockFixture.bars(spark, nDays = 3, minutesPerDay = 40)
      .withColumn("symbol", lit("SIE"))
    val alpha = 2.0 / 11
    val viaAgg = bars
      .withColumn("ema", RecursiveSmooth.smooth($"close", alpha)
        .over(Window.partitionBy($"symbol").orderBy($"date")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"date", $"ema")
    val viaScan = RecursiveIndicators.emaPartitioned(
      bars, "symbol", "date", "close", alpha)
      .select($"date", $"ema")
    val joined = viaAgg.as("a").join(viaScan.as("s"), Seq("date"))
      .select(abs($"a.ema" - $"s.ema").as("d")).agg(max($"d")).head
    assert(joined.getDouble(0) < 1e-12)
  }

  test("ema_smooth is SQL-registrable via GraftExtensions") {
    GraftExtensions.register(spark)
    series.createOrReplaceTempView("ind_series")
    val out = spark.sql(
      """SELECT symbol, t, ema_smooth(close, 0.5D) OVER (
        |  PARTITION BY symbol ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ema
        |FROM ind_series""".stripMargin)
      .orderBy("symbol", "t").select($"ema").as[Double].collect()
    assert(out.take(5).toSeq == Seq(10.0, 11.0, 11.0, 12.0, 13.0))
  }

  test("grouped (non-window) use of the recursive smooth fails fast") {
    // order-dependent recurrences have no associative merge — the engine
    // must refuse, not silently return garbage
    val err = intercept[Exception] {
      series.groupBy($"symbol")
        .agg(RecursiveSmooth.smooth($"close", 0.5).as("ema")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.isInstanceOf[UnsupportedOperationException]))
  }

  test("frame indicators: sma / mom / roc / willr hand-checks") {
    val out = series.filter($"symbol" === "A")
      .withColumn("sma3", Indicators.sma($"close", w, 3))
      .withColumn("mom2", Indicators.mom($"close", w, 2))
      .withColumn("roc2", Indicators.roc($"close", w, 2))
      .withColumn("willr3", Indicators.willr($"close" + 1, $"close" - 1,
        $"close", w, 3))
      .orderBy("t").collect()
    // sma3 at t=3: (10+12+11)/3 = 11
    assert(math.abs(out(2).getAs[Double]("sma3") - 11.0) < 1e-12)
    // mom2 at t=3: 11 - 10 = 1
    assert(out(2).getAs[Double]("mom2") == 1.0)
    // roc2 at t=4: (13-12)*100/12
    assert(math.abs(out(3).getAs[Double]("roc2") - 100.0 / 12) < 1e-12)
    // willr3 at t=3: hh=13(high of 12+1), ll=9; (13-11)*-100/4 = -50
    assert(math.abs(out(2).getAs[Double]("willr3") + 50.0) < 1e-12)
  }

  test("rsi: all-gains series -> 100; alternating series in (0,100)") {
    val up = (1 to 20).map(i => ("A", i, i.toDouble)).toDF("symbol", "t", "close")
    val diff = $"close" - lag($"close", 1).over(w)
    val rsiUp = up.withColumn("d", diff)
      .withColumn("rsi", Indicators.rsi($"d", w, 14))
      .orderBy($"t".desc).head.getAs[Double]("rsi")
    assert(rsiUp == 100.0)
    val alt = (1 to 20).map(i =>
      ("A", i, if (i % 2 == 0) 10.0 else 5.0)).toDF("symbol", "t", "close")
    val rsiAlt = alt.withColumn("d", diff)
      .withColumn("rsi", Indicators.rsi($"d", w, 14))
      .orderBy($"t".desc).head.getAs[Double]("rsi")
    assert(rsiAlt > 0.0 && rsiAlt < 100.0)
  }

  test("varying-alpha smooth matches the hand recurrence") {
    val df = Seq(("A", 1, 10.0, 1.0), ("A", 2, 20.0, 0.5),
      ("A", 3, 30.0, 0.1)).toDF("symbol", "t", "x", "a")
    val out = df.withColumn("s",
      RecursiveSmooth.smoothVar($"x", $"a")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("t").select($"s").as[Double].collect().toSeq
    // s1 = 10 (seed); s2 = .5*20+.5*10 = 15; s3 = .1*30+.9*15 = 16.5
    assert(out == Seq(10.0, 15.0, 16.5))
  }

  test("composite indicators: kama tracks the series, adx/mfi bounded") {
    val bars = StockFixture.bars(spark, nDays = 2, minutesPerDay = 60)
      .withColumn("symbol", lit("SIE"))
      .select("symbol", "date", "close", "high", "low", "open", "volume")
    val enriched = Indicators.withUltosc(
      Indicators.withMfi(
        Indicators.withAdx(
          Indicators.withKama(bars, Indicators.symbolWindow("symbol", "date")),
          Indicators.symbolWindow("symbol", "date")),
        Indicators.symbolWindow("symbol", "date")),
      Indicators.symbolWindow("symbol", "date"))
    val rows = enriched.orderBy($"date".desc).limit(30).collect()
    val lo = bars.agg(min($"close")).head.getDouble(0)
    val hi = bars.agg(max($"close")).head.getDouble(0)
    rows.foreach { r =>
      val kama = r.getAs[Double]("kama10")
      assert(kama >= lo - 1 && kama <= hi + 1, s"kama out of range: $kama")
      val adx = r.getAs[Double]("adx14")
      assert(adx >= 0.0 && adx <= 100.0, s"adx out of range: $adx")
      val mfi = r.getAs[Double]("mfi14")
      assert(mfi >= 0.0 && mfi <= 100.0, s"mfi out of range: $mfi")
      val uo = r.getAs[Double]("ultosc")
      assert(uo >= 0.0 && uo <= 100.0, s"ultosc out of range: $uo")
    }
  }

  test("enrich: one shuffle for all frame windows, row count preserved") {
    val bars = StockFixture.bars(spark, nDays = 2, minutesPerDay = 30)
      .withColumn("symbol", lit("SIE"))
      .select("symbol", "date", "close", "high", "low", "open", "volume")
    val enriched = Indicators.enrich(bars, "symbol", "date")
    assert(enriched.count() == bars.count())
    assert(Seq("sma5", "ema10", "rsi14", "atr14", "cci20", "fastd")
      .forall(enriched.columns.contains))
    // all windows share the symbol partition spec -> exactly one exchange
    val plan = enriched.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 shuffle, got $n:\n$plan")
  }
}
