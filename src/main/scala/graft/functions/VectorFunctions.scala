package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector math over `array<float>` embedding columns (similarity-search
  * extension). Pure `zip_with`/`aggregate` expressions — no UDF, no
  * VectorUDT conversion, codegen-friendly.
  *
  * Determinism: a double-accumulator fold over a float array is
  * order-dependent; these helpers fold in DECIMAL(38,12) (exact, associative)
  * and cast the result to double, so Spark and the DuckDB oracle agree
  * bit-for-bit. The `*Fast` variants use plain double folds for production
  * use where the oracle is not in the loop.
  */
object VectorFunctions {

  /** Element/accumulator decimal types sized so every fold step is EXACT:
    * (37,12) + (25,12) has result precision max(25,13)+12+1 = 38 — no
    * scale reduction, no intermediate rounding — and the cast back to
    * (37,12) keeps the scale, so it never rounds either. (A naive
    * (38,12) accumulator silently loses a digit per addition: Spark
    * widens (38,12)+(38,12) to (38,11).) */
  private val DElem = DecimalType(25, 12)
  private val DAcc = DecimalType(37, 12)

  /** Exact dot product: per-element double multiply, decimal-exact sum. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast(DElem)),
      lit(java.math.BigDecimal.ZERO).cast(DAcc),
      (acc, x) => (acc + x).cast(DAcc)).cast("double")

  /** Exact squared L2 norm. */
  def norm2Exact(a: Column): Column = dotExact(a, a)

  /** Cosine similarity, decimal-stabilised; 0 when either norm is 0. */
  def cosineExact(a: Column, b: Column): Column = {
    val denom = sqrt(norm2Exact(a)) * sqrt(norm2Exact(b))
    when(denom > 0, dotExact(a, b) / denom).otherwise(lit(0.0))
  }

  /** [[cosineExact]] with the two norms supplied by the caller (each must
    * be `sqrt(norm2Exact(v))` of its vector). Exactly the same expression
    * tree after substitution — bit-identical result — but lets an N·C pair
    * loop hoist each side's norm out of the loop: 3 decimal folds per pair
    * become 1. */
  def cosineExactPre(a: Column, b: Column, normA: Column,
      normB: Column): Column = {
    val denom = normA * normB
    when(denom > 0, dotExact(a, b) / denom).otherwise(lit(0.0))
  }

  /** Production dot product: the native codegen'd [[FloatDot]]
    * expression (HOF folds are CodegenFallback — interpreted per
    * element; the custom expression is a primitive loop inside
    * whole-stage codegen). Summation order = array order, so for
    * NULL-FREE, EQUAL-LENGTH arrays — the embedding-table invariant —
    * values are bit-identical to the HOF double fold it replaced
    * ([[dotHof]], kept for the equality spec). Degenerate inputs
    * diverge by design: a null ELEMENT contributes 0 (the HOF fold
    * poisons the whole sum to NULL) and a length mismatch folds the
    * common prefix (the HOF returns NULL). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      FloatDot(org.apache.spark.sql.GraftColumnBridge.toExpression(a),
        org.apache.spark.sql.GraftColumnBridge.toExpression(b)))

  /** The higher-order-function double fold (pre-FloatDot production
    * path) — retained as the cross-check twin. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** [[cosine]] with caller-supplied norms (each `sqrt(dot(v, v))` of
    * its side) — the fast-path twin of [[cosineExactPre]]: hoists the
    * two norms out of a pair loop, bit-identical to [[cosine]] on the
    * same inputs. */
  def cosinePre(a: Column, b: Column, normA: Column,
      normB: Column): Column = {
    val denom = normA * normB
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** L2-normalise an embedding (for cosine-as-dot at query time). */
  def l2Normalize(a: Column): Column = {
    val n = sqrt(dot(a, a))
    when(n > 0, transform(a, x => x.cast("double") / n))
      .otherwise(transform(a, x => x.cast("double")))
  }
}
