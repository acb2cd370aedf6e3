package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.indicators.ParabolicSar

/** Parabolic SAR: window evaluation vs an independent driver-side fold,
  * and the order-dependence (merge-throws) contract. */
class ParabolicSarSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference fold (plain Scala, no Spark) — Wilder's
    * two-bar clamp, matching the operator's convention. */
  private def refSar(bars: Seq[(Double, Double)]): Seq[Option[Double]] = {
    val step = 0.02; val maxAf = 0.2
    var up = true; var sar = 0.0; var ep = 0.0; var af = step
    var pl = 0.0; var ph = 0.0; var pl2 = 0.0; var ph2 = 0.0
    bars.zipWithIndex.map { case ((h, l), i) =>
      if (i == 0) {
        up = true; sar = l; ep = h; af = step
        pl = l; ph = h; pl2 = l; ph2 = h
        None
      } else {
        var next = sar + af * (ep - sar)
        if (up) {
          next = math.min(next, math.min(pl, pl2))
          if (l < next) { up = false; sar = ep; ep = l; af = step }
          else {
            sar = next
            if (h > ep) { ep = h; af = math.min(af + step, maxAf) }
          }
        } else {
          next = math.max(next, math.max(ph, ph2))
          if (h > next) { up = true; sar = ep; ep = h; af = step }
          else {
            sar = next
            if (l < ep) { ep = l; af = math.min(af + step, maxAf) }
          }
        }
        pl2 = pl; ph2 = ph
        pl = l; ph = h
        Some(sar)
      }
    }
  }

  // an up-leg, a sharp drop (forces a down reversal), then recovery
  // (forces an up reversal)
  private val series: Seq[(Double, Double)] = Seq(
    (10.0, 9.0), (10.5, 9.5), (11.0, 10.0), (11.5, 10.5), (12.0, 11.0),
    (11.0, 9.8), (10.0, 8.5), (9.0, 7.5), (8.5, 7.0),
    (9.5, 8.0), (11.0, 9.5), (12.5, 11.0))

  test("window SAR equals the independent fold, reversals included") {
    val df = series.zipWithIndex
      .map { case ((h, l), i) => (i, h, l) }.toDF("i", "high", "low")
    val w = Window.orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.withColumn("sar", ParabolicSar.sar($"high", $"low").over(w))
      .orderBy($"i").select($"sar").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val expected = refSar(series)
    assert(got.toSeq == expected)
    // the series must actually exercise both reversal branches
    val vals = expected.flatten
    assert(vals.exists(v => v > 11.0) && vals.exists(v => v < 8.0))
  }

  test("SAR in a groupBy (distributed merge) fails fast") {
    val df = series.map { case (h, l) => (1, h, l) }.toDF("k", "high", "low")
    val ex = intercept[Exception] {
      df.groupBy($"k").agg(ParabolicSar.sar($"high", $"low")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[UnsupportedOperationException]))
  }
}
