package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd product-quantization encoder: all `m` subspace
  * codes of a dim-`m·d` float vector packed into one long (4 bits per
  * code, so `k ≤ 16`; `m ≤ 16`).
  *
  * WHY (the §4.3-ladder argument, third instance after
  * [[FloatDot]]/[[SimHash32]]): the declarative encoder
  * (`SimilaritySearch.pqEncode`) evaluates m·k interpreted
  * `aggregate(zip_with(…))` folds per row. Encoding IS the pipeline
  * cost when PQ-compressing an embedding corpus — this expression is
  * one fused primitive loop (m·k·d FMAs, no allocation) inside
  * whole-stage codegen, and the packed-long output is the 4-byte/8-code
  * storage layout the 100 TB index actually wants.
  *
  * Bit-compatible with the declarative path: distances accumulate in
  * double over ascending element order (same IEEE ops as the HOF fold),
  * the argmin keeps the FIRST index on ties (strict `<`, matching
  * `array_position`'s first-match), and a null element contributes as
  * value 0f (the embedding contract is null-free; this only pins the
  * degenerate case). The codebook rides along as a flattened
  * `float[m·k·d]` reference object — laid out `[mi][ki][di]`. */
case class PqEncode32(child: Expression, codebook: Array[Float],
    m: Int, k: Int, d: Int) extends UnaryExpression {

  require(k <= 16 && m <= 16, s"pq_encode32 packs 4-bit codes: m=$m k=$k")
  require(codebook.length == m * k * d,
    s"codebook length ${codebook.length} != m*k*d = ${m * k * d}")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode32 expects array<float>, got $other")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var out = 0L
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var ki = 0
      while (ki < k) {
        var acc = 0.0
        var di = 0
        while (di < d) {
          val xi = mi * d + di
          val xv: Double =
            if (xi < x.numElements() && !x.isNullAt(xi))
              x.getFloat(xi).toDouble
            else 0.0
          val diff = xv - codebook((mi * k + ki) * d + di).toDouble
          acc += diff * diff
          di += 1
        }
        if (acc < bestDist) { bestDist = acc; best = ki }
        ki += 1
      }
      out |= best.toLong << (4 * mi)
      mi += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val di = ctx.freshName("di")
      val xi = ctx.freshName("xi")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val diff = ctx.freshName("diff")
      s"""
         |long $out = 0L;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0;
         |  double $bestDist = Double.MAX_VALUE;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    double $acc = 0.0;
         |    for (int $di = 0; $di < $d; $di++) {
         |      int $xi = $mi * $d + $di;
         |      double $xv = 0.0;
         |      if ($xi < $a.numElements() && !$a.isNullAt($xi)) {
         |        $xv = (double) $a.getFloat($xi);
         |      }
         |      double $diff = $xv - (double) $cb[($mi * $k + $ki) * $d + $di];
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $bestDist) { $bestDist = $acc; $best = $ki; }
         |  }
         |  $out |= ((long) $best) << (4 * $mi);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncode32 = copy(child = newChild)

  override def prettyName: String = "pq_encode32"
}
