package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd 32-bit SimHash over a token array.
  *
  * WHY A CUSTOM EXPRESSION (the same §4.3-ladder argument as
  * [[FloatDot]]): the declarative form — `aggregate` over
  * `transform(tokens, md5…)` folding a 32-counter vector through
  * `zip_with` — is `CodegenFallback`: every token pays interpreted
  * lambda dispatch and a fresh boxed 32-element array for each of the
  * fold's steps. At corpus scale the simhash pass IS the pipeline cost.
  * This expression is one tight loop per row: md5 once per token (the
  * value = the digest's first 4 bytes, exactly `conv(substr(md5, 1, 8),
  * 16, 10)`), 32 primitive vote updates, one bit-pack — inside
  * whole-stage codegen.
  *
  * Bit-compatible with the declarative twin (`Dedup.simhashHof`, kept
  * for the equality spec) including the degenerate cases: a NULL token
  * votes −1 on every bit (the HOF's `when(null…).otherwise(-1)`
  * collapse), an empty array yields 0.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash32 expects array<string>, got $other")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      var h = 0L
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e); }""".stripMargin)
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[32];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = 0L;
         |  if (!$a.isNullAt($i)) {
         |    $md.reset();
         |    byte[] $d = $md.digest($a.getUTF8String($i).getBytes());
         |    // sequential shift-or: Janino mis-parses the one-expression
         |    // form `((b & 0xffL) << 24) | ...` as a cast ("not a type")
         |    $h = (long) ($d[0] & 0xff);
         |    $h = ($h << 8) | (long) ($d[1] & 0xff);
         |    $h = ($h << 8) | (long) ($d[2] & 0xff);
         |    $h = ($h << 8) | (long) ($d[3] & 0xff);
         |  }
         |  for (int $j = 0; $j < 32; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash32 = copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  /** SQL registration hooks (see [[graft.GraftExtensions]]):
    * `simhash32(tokens)` over an `array<string>`. */
  private[graft] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(a) => SimHash32(a)
    case other => throw new IllegalArgumentException(
      s"simhash32 expects (tokens), got ${other.size} args")
  }
  private[graft] val sqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SimHash32].getName, "simhash32")
}
