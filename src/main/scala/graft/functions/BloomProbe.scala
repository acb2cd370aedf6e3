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
  * Deserialization is per evaluation — fine for POINT probes (one
  * hash per index row, #files evaluations total). For key SETS never
  * use this inside a rows × keys cross join (per-pair
  * deserialization); use [[BloomMissAll]], which deserializes once
  * per row and probes every hash.
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

/** BATCH bloom probe: `bloom_miss_all(bloom, array<bigint>)` →
  * `array<boolean>` — element i is TRUE when the filter DEFINITELY
  * does not contain hash i; NULL bloom → NULL (no exclusion).
  *
  * WHY (r8, found by `bench.DmlChurnScale`): key-SET pruning
  * ([[graft.sources.StatsIndex.prunedForKeys]]) once evaluated
  * [[BloomMightContain]] inside an index-rows × keys cross join —
  * deserializing the SAME per-file filter once per (file, key) PAIR.
  * A 1000-key merge against 160 bloom-armed files re-read ~190 GB of
  * filter bytes (1.2 MB × 160k evaluations) and took minutes; at the
  * 100 TB design point (10⁵ files × 10⁵ keys) it would never finish.
  * This expression restores the right complexity: ONE deserialization
  * per bloom row, all K hashes probed against the in-memory filter —
  * O(#files) filter reads total, K cheap bit-tests each.
  *
  * Evaluated once per index row (metadata-scale), so interpreted
  * evaluation (CodegenFallback) costs nothing measurable. */
case class BloomMissAll(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(BooleanType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_miss_all expects (binary, array<bigint>), got $other")
    }

  override def nullSafeEval(bloom: Any, hashes: Any): Any = {
    val f = BloomFilter.readFrom(bloom.asInstanceOf[Array[Byte]])
    val arr = hashes
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      out(i) = !f.mightContainLong(arr.getLong(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMissAll =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_miss_all"
}
