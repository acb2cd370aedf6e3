package graft.indicators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** State of a running exponential smooth: the smoothed value, or None
  * before the first non-null input. */
private[indicators] final case class SmoothState(var value: Option[Double])

/** Exponential smoothing as a custom Catalyst aggregate, for use as a
  * RUNNING WINDOW function: `ema_t = α·x_t + (1-α)·ema_{t-1}`, seeded
  * with the first observation (the convention TA libraries use for EMA
  * and, with α = 1/n, for Wilder smoothing — RSI/ATR/ADX).
  *
  * This is the one reference-derived computation Spark's built-ins cannot
  * express (SURVEY.md §4.3): a first-order linear recurrence over an
  * ordered sequence. A window SUM with exponent weights needs `pow` per
  * row-distance (numerically divergent and O(n) per row in a running
  * frame); an RDD scan loses Catalyst. As a `TypedImperativeAggregate`
  * evaluated over `ROWS UNBOUNDED PRECEDING .. CURRENT ROW` the window
  * engine calls `update` once per row and `eval` per row — O(n) per
  * partition with one small state object.
  *
  * ORDER-DEPENDENCE: the recurrence has no associative merge, so a
  * distributed (groupBy) aggregation of this function is semantically
  * undefined — `merge` throws. Use only over an ordered window, via
  * [[RecursiveSmooth.ema]] / [[RecursiveSmooth.wilder]]. Cross-partition
  * carry is impossible in one pass; partition by symbol so each series
  * lives in one partition (SURVEY.md §7.4.1), which the `.over(window)`
  * form enforces by construction.
  */
case class ExponentialSmooth(
    child: Expression,
    alphaExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmoothState] {

  private lazy val alpha: Double = alphaExpr match {
    case Literal(v, DoubleType) => v.asInstanceOf[Double]
    case _ => throw new IllegalArgumentException(
      "ema/wilder alpha must be a double literal")
  }

  override def children: Seq[Expression] = Seq(child, alphaExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): SmoothState = SmoothState(None)

  override def update(state: SmoothState, input: InternalRow): SmoothState = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      state.value = Some(state.value match {
        case Some(s) => alpha * x + (1 - alpha) * s
        case None => x
      })
    }
    state
  }

  override def merge(a: SmoothState, b: SmoothState): SmoothState =
    throw new UnsupportedOperationException(
      "ExponentialSmooth is order-dependent and cannot be merged; " +
        "use it over an ordered window, not in a groupBy")

  override def eval(state: SmoothState): Any =
    state.value.map(Double.box).orNull

  override def serialize(state: SmoothState): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(9)
    state.value match {
      case Some(v) => b.put(1: Byte).putDouble(v)
      case None => b.put(0: Byte).putDouble(0.0)
    }
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): SmoothState = {
    val b = java.nio.ByteBuffer.wrap(bytes)
    val defined = b.get() == (1: Byte)
    val v = b.getDouble
    SmoothState(if (defined) Some(v) else None)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExponentialSmooth =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExponentialSmooth =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExponentialSmooth =
    copy(child = newChildren(0), alphaExpr = newChildren(1))
  override def prettyName: String = "ema_smooth"
}

/** Varying-coefficient smooth: `s_t = α_t·x_t + (1-α_t)·s_{t-1}` with a
  * PER-ROW α (KAMA's adaptive smoothing constant). Same window-only,
  * merge-throws contract as [[ExponentialSmooth]]. */
case class VaryingExponentialSmooth(
    child: Expression,
    alphaChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmoothState] {

  override def children: Seq[Expression] = Seq(child, alphaChild)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): SmoothState = SmoothState(None)

  override def update(state: SmoothState, input: InternalRow): SmoothState = {
    val v = child.eval(input)
    val a = alphaChild.eval(input)
    if (v != null && a != null) {
      val x = v.asInstanceOf[Double]
      val alpha = a.asInstanceOf[Double]
      state.value = Some(state.value match {
        case Some(s) => alpha * x + (1 - alpha) * s
        case None => x
      })
    }
    state
  }

  override def merge(a: SmoothState, b: SmoothState): SmoothState =
    throw new UnsupportedOperationException(
      "VaryingExponentialSmooth is order-dependent and cannot be merged; " +
        "use it over an ordered window, not in a groupBy")

  override def eval(state: SmoothState): Any =
    state.value.map(Double.box).orNull

  override def serialize(state: SmoothState): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(9)
    state.value match {
      case Some(v) => b.put(1: Byte).putDouble(v)
      case None => b.put(0: Byte).putDouble(0.0)
    }
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): SmoothState = {
    val b = java.nio.ByteBuffer.wrap(bytes)
    val defined = b.get() == (1: Byte)
    val v = b.getDouble
    SmoothState(if (defined) Some(v) else None)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : VaryingExponentialSmooth = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : VaryingExponentialSmooth = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VaryingExponentialSmooth =
    copy(child = newChildren(0), alphaChild = newChildren(1))
  override def prettyName: String = "var_ema_smooth"
}

object RecursiveSmooth {

  private def smoothCol(c: Column, alpha: Double): Column =
    GraftColumnBridge.toColumn(AggregateExpression(
      ExponentialSmooth(GraftColumnBridge.toExpression(c), Literal(alpha)),
      Complete, isDistinct = false))

  /** Varying-α smooth — apply over a running per-symbol window. */
  def smoothVar(c: Column, alpha: Column): Column =
    GraftColumnBridge.toColumn(AggregateExpression(
      VaryingExponentialSmooth(GraftColumnBridge.toExpression(c),
        GraftColumnBridge.toExpression(alpha)),
      Complete, isDistinct = false))

  /** `ema(c, n)` with the standard α = 2/(n+1); apply
    * `.over(Window.partitionBy(symbol).orderBy(ts).rowsBetween(
    * Window.unboundedPreceding, Window.currentRow))`. */
  def ema(c: Column, n: Int): Column = smoothCol(c, 2.0 / (n + 1))

  /** Wilder smoothing, α = 1/n — the RSI/ATR/ADX recurrence. */
  def wilder(c: Column, n: Int): Column = smoothCol(c, 1.0 / n)

  /** Raw α form (SQL surface registers this as `ema_smooth(x, alpha)`). */
  def smooth(c: Column, alpha: Double): Column = smoothCol(c, alpha)

  /** The ExpressionInfo + builder for SQL registration (see
    * [[graft.GraftExtensions]]): `ema_smooth(x, alpha) OVER (...)`. */
  private[graft] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(x, a) => ExponentialSmooth(x, a)
    case other => throw new IllegalArgumentException(
      s"ema_smooth expects (value, alpha), got ${other.size} args")
  }
  private[graft] val sqlInfo = new ExpressionInfo(
    classOf[ExponentialSmooth].getName, "ema_smooth")
}
