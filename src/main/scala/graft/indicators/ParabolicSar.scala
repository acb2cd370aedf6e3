package graft.indicators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Parabolic SAR state: trend direction, extreme point, acceleration
  * factor, current stop, and the previous TWO bars' lows/highs for
  * Wilder's clamp. */
private[indicators] final case class SarState(
    var started: Boolean,
    var up: Boolean,
    var sar: Double,
    var ep: Double,
    var af: Double,
    var prevLow: Double,
    var prevHigh: Double,
    var prevLow2: Double,
    var prevHigh2: Double,
    /** false until the second bar — the first bar has no prior trend and
      * emits null. */
    var emittedFirst: Boolean = false)

/** Parabolic SAR (stop-and-reverse) — the trend-flip state machine the
  * reference consumes as a precomputed `SAR` column (SURVEY.md §1.2) and
  * COVERAGE.md listed as a gap. Like the EMA family it is an ordered
  * recurrence SQL aggregates cannot express, with richer state: per bar,
  *
  *   sar' = sar + af·(ep − sar), clamped not to enter the previous TWO
  *   bars' range (Wilder's rule, as TA-Lib implements it); on
  *   penetration the trend REVERSES (sar := ep, af resets); otherwise a
  *   new extreme advances ep and accelerates af by `step` up to `maxAf`.
  *
  * Convention (documented, spec-golded): the first bar seeds an UP trend
  * with sar = low, ep = high and emits null (no prior trend exists) —
  * TA-Lib instead picks the initial trend from the first bar-pair's
  * −DM and seeds ep from bar 1, so values differ through the first
  * trend leg; from the FIRST REVERSAL on (both variants reset sar := ep
  * with the same tracked extreme) the outputs are bit-identical, which
  * `IndicatorGoldenSpec` pins against TA-Lib-algorithm goldens.
  * Wilder's step 0.02 / max 0.20 defaults. Same window-only,
  * merge-throws contract as [[ExponentialSmooth]] — apply over
  * `Window.partitionBy(symbol).orderBy(ts).rowsBetween(unboundedPreceding,
  * currentRow)`.
  */
case class ParabolicSar(
    highExpr: Expression,
    lowExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SarState] {

  val Step = 0.02
  val MaxAf = 0.2

  override def children: Seq[Expression] = Seq(highExpr, lowExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): SarState =
    SarState(started = false, up = true, 0.0, 0.0, Step, 0.0, 0.0, 0.0, 0.0,
      emittedFirst = false)

  override def update(state: SarState, input: InternalRow): SarState = {
    val hv = highExpr.eval(input)
    val lv = lowExpr.eval(input)
    if (hv == null || lv == null) return state
    val high = hv.asInstanceOf[Double]
    val low = lv.asInstanceOf[Double]
    if (!state.started) {
      state.started = true
      state.up = true
      state.sar = low
      state.ep = high
      state.af = Step
      // first bar emits null via the `started && emitted` trick below:
      // we mark sar as NaN-free but remember via prevLow/High
      state.prevLow = low
      state.prevHigh = high
      state.prevLow2 = low
      state.prevHigh2 = high
      state.emittedFirst = false
      return state
    }
    var sarNext = state.sar + state.af * (state.ep - state.sar)
    if (state.up) {
      // the stop may not enter the previous two bars' range
      sarNext = math.min(sarNext, math.min(state.prevLow, state.prevLow2))
      if (low < sarNext) { // penetrated → reverse down
        state.up = false
        state.sar = state.ep
        state.ep = low
        state.af = Step
      } else {
        state.sar = sarNext
        if (high > state.ep) {
          state.ep = high
          state.af = math.min(state.af + Step, MaxAf)
        }
      }
    } else {
      sarNext = math.max(sarNext, math.max(state.prevHigh, state.prevHigh2))
      if (high > sarNext) { // penetrated → reverse up
        state.up = true
        state.sar = state.ep
        state.ep = high
        state.af = Step
      } else {
        state.sar = sarNext
        if (low < state.ep) {
          state.ep = low
          state.af = math.min(state.af + Step, MaxAf)
        }
      }
    }
    state.prevLow2 = state.prevLow
    state.prevHigh2 = state.prevHigh
    state.prevLow = low
    state.prevHigh = high
    state.emittedFirst = true
    state
  }

  override def merge(a: SarState, b: SarState): SarState =
    throw new UnsupportedOperationException(
      "ParabolicSar is order-dependent and cannot be merged; " +
        "use it over an ordered window, not in a groupBy")

  override def eval(state: SarState): Any =
    if (state.started && state.emittedFirst) Double.box(state.sar) else null

  override def serialize(state: SarState): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(3 + 7 * 8)
    b.put(if (state.started) 1: Byte else 0: Byte)
    b.put(if (state.up) 1: Byte else 0: Byte)
    b.put(if (state.emittedFirst) 1: Byte else 0: Byte)
    b.putDouble(state.sar).putDouble(state.ep).putDouble(state.af)
    b.putDouble(state.prevLow).putDouble(state.prevHigh)
    b.putDouble(state.prevLow2).putDouble(state.prevHigh2)
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): SarState = {
    val b = java.nio.ByteBuffer.wrap(bytes)
    val started = b.get() == (1: Byte)
    val up = b.get() == (1: Byte)
    val emitted = b.get() == (1: Byte)
    SarState(started, up, b.getDouble, b.getDouble, b.getDouble,
      b.getDouble, b.getDouble, b.getDouble, b.getDouble, emitted)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ParabolicSar =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ParabolicSar =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParabolicSar =
    copy(highExpr = newChildren(0), lowExpr = newChildren(1))
  override def prettyName: String = "parabolic_sar"
}

object ParabolicSar {
  /** `sar(high, low)` column — apply over a running per-symbol window. */
  def sar(high: Column, low: Column): Column =
    GraftColumnBridge.toColumn(AggregateExpression(
      ParabolicSar(GraftColumnBridge.toExpression(high),
        GraftColumnBridge.toExpression(low)),
      Complete, isDistinct = false))

  /** SQL registration hooks (see [[graft.GraftExtensions]]):
    * `parabolic_sar(high, low) OVER (...)`. */
  private[graft] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(h, l) => ParabolicSar(h, l)
    case other => throw new IllegalArgumentException(
      s"parabolic_sar expects (high, low), got ${other.size} args")
  }
  private[graft] val sqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ParabolicSar].getName, "parabolic_sar")
}
