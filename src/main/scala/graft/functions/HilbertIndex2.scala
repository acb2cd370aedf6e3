package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Native codegen'd 2-D Hilbert curve index: (x, y) → distance along
  * the order-`bits` Hilbert curve.
  *
  * WHY HILBERT NEXT TO Z-ORDER ([[graft.sources.ZOrder]]): the Morton
  * curve takes long jumps at power-of-two boundaries (…0111→1000 flips
  * every interleaved bit), so a box predicate maps to more, shorter
  * curve segments — i.e. more files touched. The Hilbert curve is
  * CONTINUOUS: consecutive indices are always grid-adjacent cells
  * (|Δx|+|Δy| = 1, spec-checked exhaustively), which is why
  * data-clustering layers that outgrow z-order (e.g. Databricks
  * liquid clustering) move to it.
  *
  * WHY A CUSTOM EXPRESSION (the §4.3 ladder): the xy→d algorithm is an
  * ITERATIVE bit descent — each level's (x, y) feed the next through a
  * conditional flip-and-swap rotation. Unrolled as declarative
  * `when`/shift Columns the tree multiplies ~3× per level (≈ 3^bits
  * nodes after `CollapseProject` inlines the per-level aliases) — the
  * interleave trick that kept [[graft.sources.ZOrder.interleave]]
  * declarative does not transfer. Here it is one tight primitive loop
  * inside whole-stage codegen; the DuckDB oracle twin unrolls the SAME
  * loop as a generated CTE chain ([[graft.sources.ZOrder
  * .sqlHilbertCte]]), so `q45_hilbert` proves the full iterative
  * algorithm cross-engine, level by level.
  *
  * Inputs are masked to the low `bits` bits (both engines identically);
  * the result lies in [0, 4^bits).
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits $bits outside [1, 31]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hilbert2 expects (bigint, bigint), got $other")
    }

  override def nullSafeEval(xAny: Any, yAny: Any): Any = {
    val mask = (1L << bits) - 1
    var x = xAny.asInstanceOf[Long] & mask
    var y = yAny.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val mask = (1L << bits) - 1
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xv & ${mask}L;
         |long $y = $yv & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert2"
}

object HilbertIndex2 {
  /** SQL registration ([[graft.GraftExtensions]]):
    * `hilbert2(x, y, bits)` with a foldable integer `bits`. */
  /** Widen short/int inputs to bigint — the common SQL case
    * (`x % 256` over an INT column) must not fail the type check.
    * (`AbstractDataType`/`ImplicitCastInputTypes` are private[sql], so
    * the widening is explicit here rather than analyzer-driven.) */
  private def widen(e: Expression): Expression = e.dataType match {
    case ByteType | ShortType | IntegerType => Cast(e, LongType)
    case _ => e
  }

  private[graft] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(x, y, b) =>
      if (!b.foldable) throw new IllegalArgumentException(
        "hilbert2: bits must be a literal integer, got a non-constant " +
          "expression")
      val bits = b.eval() match {
        case null => throw new IllegalArgumentException(
          "hilbert2: bits must not be NULL")
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => l.intValue()
        case s: java.lang.Short => s.intValue()
        case bt: java.lang.Byte => bt.intValue()
        case other => throw new IllegalArgumentException(
          s"hilbert2: bits must be an integer literal, got $other")
      }
      HilbertIndex2(widen(x), widen(y), bits)
    case other => throw new IllegalArgumentException(
      s"hilbert2 expects (x, y, literal bits), got ${other.size} args")
  }
  private[graft] val sqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[HilbertIndex2].getName, "hilbert2")
}
