package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.indicators.HilbertTransform

/** Hilbert-transform indicators: window evaluation vs an independent
  * driver-side fold, warm-up nulls, range sanity, merge contract. */
class HilbertTransformSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference fold (plain Scala, no Spark). Returns
    * (dcperiod, trendline) per row, None during warm-up. */
  private def refHt(xs: Seq[Double])
      : Seq[(Option[Double], Option[Double])] = {
    val price = new Array[Double](64)
    val smooth, det, q1, i1 = new Array[Double](8)
    val iTrend = new Array[Double](4)
    var i2 = 0.0; var q2 = 0.0; var re = 0.0; var im = 0.0
    var period = 0.0; var sp = 0.0
    def hil(buf: Array[Double], k: Int, adj: Double): Double =
      (0.0962 * buf(k & 7) + 0.5769 * buf((k - 2) & 7)
        - 0.5769 * buf((k - 4) & 7) - 0.0962 * buf((k - 6) & 7)) * adj
    xs.zipWithIndex.map { case (x, k) =>
      price(k & 63) = x
      def p(b: Int): Double = price((k - math.min(b, k)) & 63)
      smooth(k & 7) = (4 * p(0) + 3 * p(1) + 2 * p(2) + p(3)) / 10.0
      val adj = 0.075 * period + 0.54
      det(k & 7) = hil(smooth, k, adj)
      q1(k & 7) = hil(det, k, adj)
      i1(k & 7) = det((k - 3) & 7)
      val jI = hil(i1, k, adj)
      val jQ = hil(q1, k, adj)
      var ni2 = 0.2 * (i1(k & 7) - jQ) + 0.8 * i2
      var nq2 = 0.2 * (q1(k & 7) + jI) + 0.8 * q2
      val nre = 0.2 * (ni2 * i2 + nq2 * q2) + 0.8 * re
      val nim = 0.2 * (ni2 * q2 - nq2 * i2) + 0.8 * im
      i2 = ni2; q2 = nq2; re = nre; im = nim
      var np = period
      if (im != 0.0 && re != 0.0)
        np = 360.0 / (math.atan(im / re) * 180.0 / math.Pi)
      if (np > 1.5 * period && period > 0) np = 1.5 * period
      if (np < 0.67 * period) np = 0.67 * period
      if (np < 6.0) np = 6.0
      if (np > 50.0) np = 50.0
      period = 0.2 * np + 0.8 * period
      sp = 0.33 * period + 0.67 * sp
      val dcp = math.max(1, math.min(50, (sp + 0.5).toInt))
      iTrend(k & 3) = (0 until dcp).map(p).sum / dcp
      def it(b: Int): Double = iTrend((k - math.min(b, k)) & 3)
      val tl = (4 * it(0) + 3 * it(1) + 2 * it(2) + it(3)) / 10.0
      (if (k < 32) None else Some(sp), if (k < 63) None else Some(tl))
    }
  }

  private val series: Seq[Double] =
    (0 until 120).map(i => 100.0 + 6.0 * math.sin(i / 5.0) + 0.03 * i)

  test("window HT equals the independent fold; warm-up rows are null") {
    val df = series.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "close")
    val w = Window.orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df
      .withColumn("dcp", HilbertTransform.dcPeriod($"close").over(w))
      .withColumn("tl", HilbertTransform.trendline($"close").over(w))
      .orderBy($"i").select($"dcp", $"tl").collect()
      .map(r => (
        if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val want = refHt(series)
    got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g._1 == e._1, s"dcperiod row $i: ${g._1} vs ${e._1}")
      assert(g._2 == e._2, s"trendline row $i: ${g._2} vs ${e._2}")
    }
    // period must land in the legal [6, 50] band once warm, and the
    // sine has period 2π·5 ≈ 31 bars — the discriminator should get
    // within a few bars of it by the end
    val lastP = got.last._1.get
    assert(lastP >= 6.0 && lastP <= 50.0)
    assert(math.abs(lastP - 31.4) < 8.0, s"period estimate $lastP")
  }

  test("HT in a groupBy (distributed merge) fails fast") {
    val df = series.map(v => (1, v)).toDF("k", "close")
    val ex = intercept[Exception] {
      df.groupBy($"k").agg(HilbertTransform.dcPeriod($"close")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[UnsupportedOperationException]))
  }
}
