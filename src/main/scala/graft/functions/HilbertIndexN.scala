package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Native codegen'd N-dimensional Hilbert curve index:
  * (x₀, …, x_{n-1}) → distance along the order-`bits` curve, for any
  * 2 ≤ n with n·bits ≤ 63.
  *
  * [[HilbertIndex2]] covers the 2-D case with the classic rotate-flip
  * descent; the layouts that motivate Hilbert over Morton (liquid-style
  * clustering) routinely cluster 3–4 columns, which needs the general
  * form. This is Skilling's transpose algorithm ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — public): undo the excess
  * rotations top-down, Gray-encode across dimensions, then gather the
  * transposed bits round-robin into one long. Like the 2-D case it is
  * an ITERATIVE bit descent — declarative `when`/shift Columns multiply
  * the expression tree per level (the §4.3-ladder argument), so it is
  * one tight primitive loop inside whole-stage codegen, with the DuckDB
  * oracle twin unrolling the SAME steps as a generated CTE chain
  * ([[graft.sources.ZOrder.sqlHilbertNCte]], proven by `q48_hilbert3`).
  *
  * NOTE the curve ORIENTATION differs from [[HilbertIndex2]] (both are
  * valid Hilbert curves; adjacency — |Δ|₁ = 1 between consecutive
  * indices — is what layouts rely on, and `HilbertNSpec` checks it
  * exhaustively). Inputs are masked to the low `bits` bits; the result
  * lies in [0, 2^(n·bits)).
  */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
  extends Expression {

  private val n = children.size
  require(n >= 2, s"hilbertn needs at least 2 coordinates, got $n")
  require(bits >= 1 && n * bits <= 63,
    s"bits·dims = ${n * bits} outside [$n, 63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbertn expects bigint coordinates, arg $i is ${c.dataType}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  /** Skilling: axes (masked) → Hilbert transpose → gathered index. */
  private def axesToIndex(xs: Array[Long]): Long = {
    val m = 1L << (bits - 1)
    // inverse undo of the excess rotations, top bit down to bit 1
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode across dimensions
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((xs(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // gather: bit k of dim j lands at position k·n + (n-1-j)
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      var j = 0
      while (j < n) {
        d = (d << 1) | ((xs(j) >>> k) & 1L)
        j += 1
      }
      k -= 1
    }
    d
  }

  override def eval(input: InternalRow): Any = {
    val mask = (1L << bits) - 1
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long] & mask
      i += 1
    }
    axesToIndex(xs)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val mask = (1L << bits) - 1
    val xs = (0 until n).map(i => ctx.freshName(s"hnx$i"))
    val q = ctx.freshName("hnq")
    val p = ctx.freshName("hnp")
    val t = ctx.freshName("hnt")
    val d = ctx.freshName("hnd")
    val k = ctx.freshName("hnk")
    val init = xs.zip(evals).map { case (x, e) =>
      s"long $x = ${e.value} & ${mask}L;"
    }.mkString("\n")
    // phase 1, dimension loop unrolled (i = 0 reduces to the flip arm:
    // the exchange-with-self branch is a no-op)
    val undo = ((0 until n).map { i =>
      if (i == 0)
        s"  if ((${xs(0)} & $q) != 0L) ${xs(0)} ^= $p;"
      else
        s"""  if ((${xs(i)} & $q) != 0L) ${xs(0)} ^= $p;
           |  else { long $t$i = (${xs(0)} ^ ${xs(i)}) & $p;
           |         ${xs(0)} ^= $t$i; ${xs(i)} ^= $t$i; }""".stripMargin
    }).mkString("\n")
    val gray = (1 until n).map(i => s"${xs(i)} ^= ${xs(i - 1)};")
      .mkString("\n")
    val finalXor = xs.map(x => s"$x ^= $t;").mkString("\n")
    val gather = (0 until n).map(j =>
      s"  $d = ($d << 1) | ((${xs(j)} >>> $k) & 1L);").mkString("\n")
    val body =
      s"""$init
         |for (long $q = ${1L << (bits - 1)}L; $q > 1L; $q >>= 1) {
         |  long $p = $q - 1L;
         |$undo
         |}
         |$gray
         |long $t = 0L;
         |for (long $q = ${1L << (bits - 1)}L; $q > 1L; $q >>= 1) {
         |  if ((${xs(n - 1)} & $q) != 0L) $t ^= $q - 1L;
         |}
         |$finalXor
         |long $d = 0L;
         |for (int $k = ${bits - 1}; $k >= 0; $k--) {
         |$gather
         |}
         |${ev.value} = $d;""".stripMargin
    val childCode = evals.map(_.code).reduce(_ + _)
    val nullCheck =
      if (nullable) evals.map(_.isNull).mkString(" || ") else "false"
    val guarded =
      s"""boolean ${ev.isNull} = $nullCheck;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |$body
         |}""".stripMargin
    ev.copy(code = code"$childCode\n$guarded")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(children = newChildren)

  override def prettyName: String = "hilbertn"
}

object HilbertIndexN {
  /** SQL registration ([[graft.GraftExtensions]]):
    * `hilbertn(x0, x1, …, bits)` with a foldable integer `bits`;
    * short/int coordinates widen to bigint (same explicit widening as
    * `hilbert2` — `ImplicitCastInputTypes` is private[sql]). */
  private def widen(e: Expression): Expression = e.dataType match {
    case ByteType | ShortType | IntegerType => Cast(e, LongType)
    case _ => e
  }

  private[graft] val sqlBuilder: Seq[Expression] => Expression = {
    case args if args.size >= 3 =>
      val (coords, b) = (args.init, args.last)
      if (!b.foldable) throw new IllegalArgumentException(
        "hilbertn: bits must be a literal integer, got a non-constant " +
          "expression")
      val bits = b.eval() match {
        case null => throw new IllegalArgumentException(
          "hilbertn: bits must not be NULL")
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => l.intValue()
        case s: java.lang.Short => s.intValue()
        case bt: java.lang.Byte => bt.intValue()
        case other => throw new IllegalArgumentException(
          s"hilbertn: bits must be an integer literal, got $other")
      }
      HilbertIndexN(coords.map(widen), bits)
    case other => throw new IllegalArgumentException(
      s"hilbertn expects (x0, x1, …, literal bits) with ≥ 2 coordinates," +
        s" got ${other.size} args")
  }
  private[graft] val sqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[HilbertIndexN].getName, "hilbertn")
}
