package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.indicators.{HilbertTransform, Indicators, ParabolicSar}

/** External known-answer goldens for the recursive indicator families —
  * non-self-referential parity evidence (the reference's 58 indicator
  * columns are TA-Lib output, e.g. `SAR`/`HT_DCPERIOD` in
  * `G_2_data_exploration.ipynb` cell 9).
  *
  * The golden values are produced OUTSIDE this codebase by implementing
  * TA-Lib's published algorithms (ta-lib.org / its C source semantics:
  * SMA-seeded EMA, first-n-mean-seeded Wilder RSI/ATR, −DM-seeded SAR
  * with the two-bar clamp) as an independent float64 fold and evaluating
  * it on the deterministic series below; the resulting doubles are
  * hard-coded here as literals. The series is RATIONAL (integer/decimal
  * arithmetic only — no libm calls), so the generator and this spec
  * construct bit-identical inputs on any IEEE-754 platform.
  *
  * What each family asserts:
  *  - EMA(5): our first-value seed vs TA-Lib's SMA seed differ only in
  *    priming; the difference decays as (1−α)^t, below double precision
  *    by t=160 → equality to 1e-9.
  *  - RSI(14)/ATR(14)/ADX(14): Wilder α = 1/14 decays slower → 1e-3 /
  *    1e-4 / 5e-3 at t ≥ 160 (measured residuals: 1.2e-4 / 7.6e-6 /
  *    1.1e-3; TA-Lib's Wilder-SUM smoothing of TR/±DM cancels against
  *    our Wilder-MEAN in the ±DI ratio).
  *  - SAR: seeds differ (we always open an UP trend; TA-Lib picks the
  *    trend from the first bar-pair's −DM and seeds ep from bar 1), but
  *    from the first REVERSAL both reset sar := ep with the same tracked
  *    extreme and the outputs are BIT-IDENTICAL (here: from t=13) →
  *    equality to 1e-9.
  *  - HT_DCPERIOD: analytic steady state — on a pure stationary
  *    sinusoid the homodyne discriminator (ours and TA-Lib's alike)
  *    must report the true cycle period once warm.
  */
class IndicatorGoldenSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic rational OHLC series, 200 bars: period-20 zigzag +
    * drift, integer-mod jitter on high/low. MUST match the golden
    * generator expression-for-expression (same associativity). */
  private val n = 200
  private def closeAt(t: Int): Double = {
    val p = t % 20
    val tri = if (p < 10) p else 20 - p
    100.0 + tri * 0.7 + t * 0.03
  }
  private def highAt(t: Int): Double = closeAt(t) + 0.25 + ((t * 7) % 5) * 0.04
  private def lowAt(t: Int): Double = closeAt(t) - 0.3 - ((t * 3) % 4) * 0.05

  private lazy val bars = (0 until n)
    .map(t => (t, closeAt(t), highAt(t), lowAt(t)))
    .toDF("i", "close", "high", "low")

  private val w = Window.orderBy($"i")
  private val running = w.rowsBetween(Window.unboundedPreceding,
    Window.currentRow)

  private def column(colFn: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): Map[Int, Double] =
    colFn(bars).orderBy($"i").select($"i", $"g").collect()
      .filterNot(_.isNullAt(1))
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap

  test("EMA(5) converges onto the TA-Lib (SMA-seeded) golden") {
    val got = column(_.withColumn("g", Indicators.ema($"close", w, 5)))
    val golden = Map(
      160 -> 106.0922714031262, 170 -> 110.68772859687381,
      180 -> 106.69227140312623, 190 -> 111.28772859687383,
      199 -> 107.9384071046893)
    golden.foreach { case (t, v) =>
      assert(math.abs(got(t) - v) < 1e-9, s"ema5[$t] ${got(t)} vs $v")
    }
  }

  test("RSI(14) converges onto the TA-Lib (first-mean-seeded) golden") {
    val withDiff = bars.withColumn("d", $"close" - lag($"close", 1).over(w))
    val got = withDiff.withColumn("g", Indicators.rsi($"d", w, 14))
      .orderBy($"i").select($"i", $"g").collect()
      .filterNot(_.isNullAt(1))
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val golden = Map(
      160 -> 34.17976270784392, 170 -> 69.56896813932705,
      180 -> 34.179427376595015, 190 -> 69.56881774368088,
      199 -> 36.72916143231742)
    golden.foreach { case (t, v) =>
      assert(math.abs(got(t) - v) < 1e-3, s"rsi14[$t] ${got(t)} vs $v")
    }
  }

  test("ATR(14) converges onto the TA-Lib golden") {
    val withTr = bars.withColumn("tr",
      Indicators.trange($"high", $"low", $"close", w))
    val got = withTr.withColumn("g", Indicators.atr($"tr", w, 14))
      .orderBy($"i").select($"i", $"g").collect()
      .filterNot(_.isNullAt(1))
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val golden = Map(
      160 -> 1.0411581856235304, 170 -> 1.0494148346614065,
      180 -> 1.0411580817387924, 190 -> 1.0494147851500402,
      199 -> 1.0466317549218562)
    golden.foreach { case (t, v) =>
      assert(math.abs(got(t) - v) < 1e-4, s"atr14[$t] ${got(t)} vs $v")
    }
  }

  test("SAR is bit-identical to the TA-Lib golden after the first " +
    "reversal") {
    val got = column(_.withColumn("g",
      ParabolicSar.sar($"high", $"low").over(running)))
    val golden = Map(
      160 -> 109.7322077517824, 170 -> 106.6847014888448,
      180 -> 110.33220775178239, 190 -> 107.2847014888448,
      199 -> 111.56114517248)
    golden.foreach { case (t, v) =>
      assert(math.abs(got(t) - v) < 1e-9, s"sar[$t] ${got(t)} vs $v")
    }
  }

  test("ADX(14) converges onto the TA-Lib (Wilder-sum) golden") {
    // TA-Lib smooths TR/±DM with Wilder SUMS (S − S/n + x); we smooth
    // with Wilder MEANS — the factor n cancels in the ±DI ratio, so
    // only the seeding differs and the DX/ADX streams converge
    val got = Indicators.withAdx(bars, w, 14, out = "g")
      .orderBy($"i").select($"i", $"g").collect()
      .filterNot(_.isNullAt(1))
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val golden = Map(
      160 -> 19.359946694288062, 170 -> 20.751239685369143,
      180 -> 19.359145079982515, 190 -> 20.750772736621123,
      199 -> 18.448053859755884)
    golden.foreach { case (t, v) =>
      assert(math.abs(got(t) - v) < 5e-3, s"adx14[$t] ${got(t)} vs $v")
    }
  }

  test("HT_DCPERIOD reports the true cycle on a stationary sinusoid " +
    "(analytic golden)") {
    // period-25 pure sine, no trend: the homodyne's steady state is the
    // true period — the same value TA-Lib's HT_DCPERIOD converges to on
    // this input. 2π/25 per bar; 300 bars ≈ 12 cycles.
    val truePeriod = 25.0
    val sine = (0 until 300)
      .map(i => (i, 100.0 + 10.0 * math.sin(2 * math.Pi * i / truePeriod)))
      .toDF("i", "close")
    val got = sine.withColumn("g",
      HilbertTransform.dcPeriod($"close").over(running))
      .orderBy($"i").select($"i", $"g").collect()
      .filterNot(_.isNullAt(1))
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // post-warm-up tail: every estimate within 10% of truth
    (250 until 300).foreach { t =>
      assert(math.abs(got(t) - truePeriod) <= 2.5,
        s"dcperiod[$t] = ${got(t)}, want ~$truePeriod")
    }
  }
}
