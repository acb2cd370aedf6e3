package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a PER-ROW serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] column.
  *
  * WHY A CUSTOM EXPRESSION (SURVEY.md §4.3 ladder, step b): Spark ships
  * `BloomFilterMightContain`, but its type check requires the bloom
  * side to be FOLDABLE (a literal or scalar subquery) — it exists for
  * runtime join filters where one bloom is broadcast to every row.
  * [[graft.sources.StatsIndex]] needs the opposite shape: the index
  * table has one DIFFERENT bloom per row (per data file), so the
  * filter side must be a plain column. A Scala UDF would work but
  * drops out of codegen; this stays a native expression.
  *
  * Semantics: `bloom_might_contain(bloom, hash)` — left is the
  * serialized filter (as written by Spark's `BloomFilterAggregate`
  * or `BloomFilter.writeTo`), right the XXH64 hash of the probed
  * value (hash with `xxhash64` on BOTH build and probe sides, same
  * input type, or the bits disagree). Either side NULL → NULL, which
  * [[graft.sources.StatsIndex]]'s exclusion filters treat as "cannot
  * exclude" — a row without a bloom can never prune a file.
  * Deserialization is per evaluation; that is inherent to the
  * one-bloom-per-row shape (each row's filter is distinct) and the
  * index is metadata-scale (#files rows), not data-scale.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got $other")
    }

  override def nullSafeEval(bloom: Any, hash: Any): Any =
    BloomMightContain.test(bloom.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bloom, hash) =>
      s"graft.functions.BloomMightContain.test($bloom, $hash)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  /** Called from generated code; deserialize + probe. A corrupt or
    * truncated filter is a real index defect — let it throw (the
    * index build wrote it; silent `true` would hide the corruption,
    * silent `false` would wrongly prune). */
  def test(bloom: Array[Byte], hash: Long): Boolean =
    BloomFilter.readFrom(bloom).mightContainLong(hash)

  /** SQL registration hooks (see [[graft.GraftExtensions]]). */
  private[graft] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => BloomMightContain(a, b)
    case other => throw new IllegalArgumentException(
      s"bloom_might_contain expects (bloom, hash), got ${other.size} args")
  }
  private[graft] val sqlInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[BloomMightContain].getName, "bloom_might_contain")
}
