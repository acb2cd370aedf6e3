package graft.indicators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared state of the Hilbert-transform cycle analyser: ring buffers of
  * the recent smoothed/detrended/quadrature series plus the recursive
  * period trackers. Serialized as a flat double array. */
private[indicators] final class HtState extends Serializable {
  var n: Int = 0 // rows seen
  val price = new Array[Double](64) // ring of raw inputs (trendline sum)
  val smooth = new Array[Double](8)
  val detrender = new Array[Double](8)
  val q1 = new Array[Double](8)
  val i1 = new Array[Double](8)
  var i2, q2, re, im = 0.0
  var period = 0.0
  var smoothPeriod = 0.0
  val iTrend = new Array[Double](4) // ring of instantaneous trends
}

/** HT_DCPERIOD / HT_TRENDLINE — the Hilbert-transform dominant-cycle
  * indicators the reference consumes as precomputed columns
  * (SURVEY.md §1.2), closing the last COVERAGE.md indicator gap.
  *
  * Algorithm: Ehlers' homodyne discriminator (as published in "Rocket
  * Science for Traders"): 4-bar WMA smoothing → 7-tap Hilbert FIR for
  * detrender and quadrature → complex product with the 1-bar-delayed
  * phasor → recursively smoothed real/imag parts → period from the
  * phase delta, clamped to [6, 50] and rate-limited → double-smoothed
  * into `smoothPeriod` (= HT_DCPERIOD). HT_TRENDLINE is the 4-bar WMA
  * of the instantaneous trend (mean of the last ⌊smoothPeriod+0.5⌋
  * closes).
  *
  * ENGINE CONVENTIONS (documented divergence, not TA-Lib parity): the
  * warm-up rows emit null (TA-Lib's unstable period: 32 bars for
  * DCPERIOD, 63 for TRENDLINE), and warm-up history is clamped to the
  * oldest seen price rather than TA-Lib's WMA priming — so values
  * within/near the warm-up window differ from TA-Lib's, converging as
  * the recursive state washes out. The spec pins THIS implementation's
  * recurrence (self-consistency + structural invariants), not TA-Lib
  * golden values.
  *
  * Same window-only, merge-throws contract as [[ExponentialSmooth]]:
  * an ordered recurrence has no associative merge. Apply over
  * `Window.partitionBy(symbol).orderBy(ts).rowsBetween(unboundedPreceding,
  * currentRow)`.
  */
case class HilbertTransform(
    child: Expression,
    emitTrendline: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HtState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): HtState = new HtState

  private def hilbert(buf: Array[Double], idx: Int, adj: Double): Double =
    (0.0962 * buf(idx & 7) + 0.5769 * buf((idx - 2) & 7)
      - 0.5769 * buf((idx - 4) & 7) - 0.0962 * buf((idx - 6) & 7)) * adj

  override def update(s: HtState, input: InternalRow): HtState = {
    val v = child.eval(input)
    if (v == null) return s
    val x = v.asInstanceOf[Double]
    val k = s.n // absolute row index
    s.price(k & 63) = x
    // 4-bar WMA smoothing (uses raw values until 4 rows exist)
    def p(back: Int): Double = s.price((k - math.min(back, k)) & 63)
    s.smooth(k & 7) = (4 * p(0) + 3 * p(1) + 2 * p(2) + p(3)) / 10.0
    val adj = 0.075 * s.period + 0.54
    s.detrender(k & 7) = hilbert(s.smooth, k, adj)
    // quadrature and in-phase components
    s.q1(k & 7) = hilbert(s.detrender, k, adj)
    s.i1(k & 7) = s.detrender((k - 3) & 7)
    val jI = hilbert(s.i1, k, adj)
    val jQ = hilbert(s.q1, k, adj)
    var i2 = s.i1(k & 7) - jQ
    var q2 = s.q1(k & 7) + jI
    i2 = 0.2 * i2 + 0.8 * s.i2
    q2 = 0.2 * q2 + 0.8 * s.q2
    val re = 0.2 * (i2 * s.i2 + q2 * s.q2) + 0.8 * s.re
    val im = 0.2 * (i2 * s.q2 - q2 * s.i2) + 0.8 * s.im
    s.i2 = i2; s.q2 = q2; s.re = re; s.im = im
    var period = s.period
    if (im != 0.0 && re != 0.0) {
      period = 360.0 / (math.atan(im / re) * 180.0 / math.Pi)
    }
    if (period > 1.5 * s.period && s.period > 0) period = 1.5 * s.period
    if (period < 0.67 * s.period) period = 0.67 * s.period
    if (period < 6.0) period = 6.0
    if (period > 50.0) period = 50.0
    period = 0.2 * period + 0.8 * s.period
    s.period = period
    s.smoothPeriod = 0.33 * period + 0.67 * s.smoothPeriod
    // instantaneous trend: mean of the last ⌊smoothPeriod + 0.5⌋ closes
    val dcp = math.max(1, math.min(50, (s.smoothPeriod + 0.5).toInt))
    var acc = 0.0
    var j = 0
    while (j < dcp) { acc += p(j); j += 1 }
    s.iTrend((k & 3)) = acc / dcp
    s.n += 1
    s
  }

  override def eval(s: HtState): Any = {
    val k = s.n - 1
    if (k < 0) return null
    if (!emitTrendline) {
      if (k < 32) null else Double.box(s.smoothPeriod)
    } else {
      if (k < 63) null
      else {
        def it(back: Int): Double = s.iTrend((k - math.min(back, k)) & 3)
        Double.box((4 * it(0) + 3 * it(1) + 2 * it(2) + it(3)) / 10.0)
      }
    }
  }

  override def merge(a: HtState, b: HtState): HtState =
    throw new UnsupportedOperationException(
      "HilbertTransform is order-dependent and cannot be merged; " +
        "use it over an ordered window, not in a groupBy")

  override def serialize(s: HtState): Array[Byte] = {
    val doubles = Array(s.n.toDouble, s.i2, s.q2, s.re, s.im, s.period,
      s.smoothPeriod) ++ s.price ++ s.smooth ++ s.detrender ++ s.q1 ++
      s.i1 ++ s.iTrend
    val b = java.nio.ByteBuffer.allocate(doubles.length * 8)
    doubles.foreach(b.putDouble)
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): HtState = {
    val b = java.nio.ByteBuffer.wrap(bytes)
    val s = new HtState
    s.n = b.getDouble.toInt
    s.i2 = b.getDouble; s.q2 = b.getDouble
    s.re = b.getDouble; s.im = b.getDouble
    s.period = b.getDouble; s.smoothPeriod = b.getDouble
    def fill(a: Array[Double]): Unit = a.indices.foreach(i => a(i) = b.getDouble)
    fill(s.price); fill(s.smooth); fill(s.detrender); fill(s.q1)
    fill(s.i1); fill(s.iTrend)
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HilbertTransform =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HilbertTransform =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertTransform =
    copy(child = newChildren(0))
  override def prettyName: String =
    if (emitTrendline) "ht_trendline" else "ht_dcperiod"
}

object HilbertTransform {
  /** HT_DCPERIOD column — apply over a running per-symbol window. */
  def dcPeriod(price: Column): Column =
    GraftColumnBridge.toColumn(AggregateExpression(
      HilbertTransform(GraftColumnBridge.toExpression(price),
        emitTrendline = false),
      Complete, isDistinct = false))

  /** HT_TRENDLINE column — apply over a running per-symbol window. */
  def trendline(price: Column): Column =
    GraftColumnBridge.toColumn(AggregateExpression(
      HilbertTransform(GraftColumnBridge.toExpression(price),
        emitTrendline = true),
      Complete, isDistinct = false))

  /** SQL registration hooks (see [[graft.GraftExtensions]]). */
  private[graft] def sqlBuilder(trend: Boolean): Seq[Expression] => Expression = {
    case Seq(x) => HilbertTransform(x, emitTrendline = trend)
    case other => throw new IllegalArgumentException(
      s"ht_* expects (price), got ${other.size} args")
  }
  private[graft] val dcSqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[HilbertTransform].getName, "ht_dcperiod")
  private[graft] val tlSqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[HilbertTransform].getName, "ht_trendline")
}
