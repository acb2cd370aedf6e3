package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * WHY A CUSTOM EXPRESSION (SURVEY.md §4.3 ladder, step b): Spark's
  * higher-order functions (`zip_with`, `aggregate`) are `CodegenFallback`
  * — evaluated interpreted, one lambda dispatch per element, with boxed
  * accumulator updates. For ANN scoring that interpreter cost dominates
  * the scan. This expression compiles to a tight primitive `for` loop
  * inside whole-stage codegen: no allocation, no boxing, no virtual
  * dispatch per element.
  *
  * Semantics: double accumulation in ascending element order (identical
  * order — therefore identical bits — to the HOF double fold it
  * replaces); null elements contribute 0; length mismatch folds the
  * common prefix; either side NULL → NULL.
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_f32 expects (array<float>, array<float>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f32"
}

object FloatDot {
  /** SQL registration hooks (see [[graft.GraftExtensions]]). */
  private[graft] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => FloatDot(a, b)
    case other => throw new IllegalArgumentException(
      s"dot_f32 expects (a, b), got ${other.size} args")
  }
  private[graft] val sqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[FloatDot].getName, "dot_f32")
}
