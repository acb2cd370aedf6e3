package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Indicator GENERATION (SURVEY.md §7.4 extension): the reference consumes
  * 58 precomputed indicator columns from its CSV; this module computes
  * them natively so the engine can ingest raw OHLCV bars at 100 TB.
  *
  * Two families:
  *  - frame indicators — plain `rowsBetween` window aggregates
  *    (SMA/TRIMA/ROC/MOM/Bollinger/WILLR/stochastics/CCI/TYPPRICE/Trange):
  *    one shuffle per partition spec, codegen'd arithmetic;
  *  - recursive indicators — EMA and Wilder-smoothed RSI/ATR via the
  *    custom [[ExponentialSmooth]] running-window aggregate (the
  *    recurrence SQL aggregates cannot express), or the
  *    [[RecursiveIndicators.emaPartitioned]] mapPartitions twin.
  *
  * Every function takes the per-symbol window spec — at scale the series
  * must be partitioned by instrument (SURVEY.md §2.5 W4: an unpartitioned
  * window collapses to one task).
  */
object Indicators {

  /** Per-symbol ordered window (the scale-correct spec). */
  def symbolWindow(symbolCol: String, tsCol: String): WindowSpec =
    Window.partitionBy(col(symbolCol)).orderBy(col(tsCol))

  private def frame(w: WindowSpec, n: Int): WindowSpec =
    w.rowsBetween(-(n - 1), 0)

  private def running(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  // ---- frame indicators ----

  def sma(c: Column, w: WindowSpec, n: Int): Column =
    avg(c).over(frame(w, n))

  /** TRIMA(n): SMA of the SMA (triangular weights) — compose two frames. */
  def trima(smaCol: Column, w: WindowSpec, n: Int): Column =
    avg(smaCol).over(frame(w, n))

  def mom(c: Column, w: WindowSpec, n: Int): Column =
    c - lag(c, n).over(w)

  def roc(c: Column, w: WindowSpec, n: Int): Column =
    (c - lag(c, n).over(w)) * lit(100.0) / lag(c, n).over(w)

  def typPrice(high: Column, low: Column, close: Column): Column =
    (high + low + close) / lit(3.0)

  /** True range: needs the previous close (offset window). */
  def trange(high: Column, low: Column, close: Column,
      w: WindowSpec): Column = {
    val prevClose = lag(close, 1).over(w)
    greatest(high - low, abs(high - prevClose), abs(low - prevClose))
  }

  def bollingerMiddle(c: Column, w: WindowSpec, n: Int): Column =
    avg(c).over(frame(w, n))
  def bollingerUpper(c: Column, w: WindowSpec, n: Int, k: Double = 2.0): Column =
    avg(c).over(frame(w, n)) + lit(k) * stddev_pop(c).over(frame(w, n))
  def bollingerLower(c: Column, w: WindowSpec, n: Int, k: Double = 2.0): Column =
    avg(c).over(frame(w, n)) - lit(k) * stddev_pop(c).over(frame(w, n))

  def willr(high: Column, low: Column, close: Column, w: WindowSpec,
      n: Int): Column = {
    val hh = max(high).over(frame(w, n))
    val ll = min(low).over(frame(w, n))
    when(hh =!= ll, (hh - close) * lit(-100.0) / (hh - ll)).otherwise(lit(0.0))
  }

  /** Stochastic %K over n bars. */
  def fastK(high: Column, low: Column, close: Column, w: WindowSpec,
      n: Int): Column = {
    val hh = max(high).over(frame(w, n))
    val ll = min(low).over(frame(w, n))
    when(hh =!= ll, (close - ll) * lit(100.0) / (hh - ll)).otherwise(lit(0.0))
  }

  /** %D = SMA(3) of %K — pass the materialised %K column. */
  def fastD(fastKCol: Column, w: WindowSpec): Column =
    avg(fastKCol).over(frame(w, 3))

  /** CCI(n) = (tp − SMA(tp)) / (0.015 · mean |tp − SMA(tp)|). The mean
    * absolute deviation needs the frame average of a frame average —
    * materialise `tp` and `sma_tp` as columns first (two window passes
    * over the SAME partition spec → one sort, no extra shuffle). */
  def cci(tp: Column, smaTp: Column, w: WindowSpec, n: Int): Column = {
    val mad = avg(abs(tp - smaTp)).over(frame(w, n))
    when(mad =!= 0.0, (tp - smaTp) / (lit(0.015) * mad)).otherwise(lit(0.0))
  }

  // ---- recursive indicators (custom aggregate) ----

  def ema(c: Column, w: WindowSpec, n: Int): Column =
    RecursiveSmooth.ema(c, n).over(running(w))

  /** Wilder RSI(n): 100 − 100/(1 + smoothedGain/smoothedLoss), gains and
    * losses Wilder-smoothed (α = 1/n). Pass the materialised diff column
    * (`close − lag(close)`). */
  def rsi(diff: Column, w: WindowSpec, n: Int): Column = {
    val gain = when(diff > 0, diff).otherwise(lit(0.0))
    val loss = when(diff < 0, -diff).otherwise(lit(0.0))
    val avgGain = RecursiveSmooth.wilder(gain, n).over(running(w))
    val avgLoss = RecursiveSmooth.wilder(loss, n).over(running(w))
    when(avgLoss === 0.0, lit(100.0))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss))
  }

  /** ATR(n) = Wilder smooth of true range — pass the materialised trange
    * column. */
  def atr(trangeCol: Column, w: WindowSpec, n: Int): Column =
    RecursiveSmooth.wilder(trangeCol, n).over(running(w))

  /** One-stop enrichment: raw OHLCV bars → the reference's core indicator
    * set. All frame windows share one partition spec, so the plan is a
    * single shuffle + sort followed by window passes. */
  def enrich(bars: DataFrame, symbolCol: String, tsCol: String): DataFrame = {
    val w = symbolWindow(symbolCol, tsCol)
    val c = col("close"); val h = col("high"); val l = col("low")
    bars
      .withColumn("sma5", sma(c, w, 5))
      .withColumn("sma10", sma(c, w, 10))
      .withColumn("sma20", sma(c, w, 20))
      .withColumn("trima5", trima(col("sma5"), w, 5))
      .withColumn("mom10", mom(c, w, 10))
      .withColumn("roc10", roc(c, w, 10))
      .withColumn("typprice", typPrice(h, l, c))
      .withColumn("trange", trange(h, l, c, w))
      .withColumn("middleband", bollingerMiddle(c, w, 20))
      .withColumn("upperband", bollingerUpper(c, w, 20))
      .withColumn("lowerband", bollingerLower(c, w, 20))
      .withColumn("willr", willr(h, l, c, w, 14))
      .withColumn("fastk", fastK(h, l, c, w, 14))
      .withColumn("fastd", fastD(col("fastk"), w))
      .withColumn("sma_tp", sma(col("typprice"), w, 20))
      .withColumn("cci20", cci(col("typprice"), col("sma_tp"), w, 20))
      .withColumn("ema5", ema(c, w, 5))
      .withColumn("ema10", ema(c, w, 10))
      .withColumn("diff", c - lag(c, 1).over(w))
      .withColumn("rsi14", rsi(col("diff"), w, 14))
      .withColumn("atr14", atr(col("trange"), w, 14))
      .drop("sma_tp", "diff")
  }
}

/** mapPartitions twin of the recursive smooth — the cross-check for
  * [[ExponentialSmooth]] and the §7.3 fallback shape. */
object RecursiveIndicators {

  /** EMA per symbol via one ordered scan per partition. Repartitions by
    * symbol and sorts within partitions — the invariant a cross-partition
    * recurrence needs (symbol ⊆ partition, rows in ts order). */
  def emaPartitioned(df: DataFrame, symbolCol: String, tsCol: String,
      valueCol: String, alpha: Double, outCol: String = "ema"): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      df.schema :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.DoubleType, nullable = true))
    val symbolIdx = df.schema.fieldIndex(symbolCol)
    val valueIdx = df.schema.fieldIndex(valueCol)
    val rdd = df
      .repartition(col(symbolCol))
      .sortWithinPartitions(col(symbolCol), col(tsCol))
      .rdd.mapPartitions { rows =>
        var currentSymbol: Any = null
        var state: Option[Double] = None
        rows.map { r =>
          val sym = r.get(symbolIdx)
          if (sym != currentSymbol) { currentSymbol = sym; state = None }
          if (!r.isNullAt(valueIdx)) {
            val x = r.getDouble(valueIdx)
            state = Some(state.fold(x)(s => alpha * x + (1 - alpha) * s))
          }
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq :+ state.map(Double.box).orNull)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
