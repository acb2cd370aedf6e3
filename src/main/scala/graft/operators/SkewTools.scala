package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (builder brief: "salting for skew").
  *
  * When one join/group key carries a disproportionate share of rows, the
  * shuffle sends that whole share to ONE reducer — the stage runs as long
  * as its hottest task. AQE's skew-join splitting handles sort-merge joins
  * at runtime; these utilities cover the cases it doesn't: shuffled hash
  * joins, deliberate pre-partitioning, and aggregations whose per-key
  * state is heavy (collect_list/distinct), where map-side combine can't
  * shrink the hot key.
  *
  * Salting is a correctness-preserving rewrite: the hot key k becomes N
  * sub-keys (k, 0..N-1); the other side replicates its k rows N× so every
  * sub-key still meets every partner. Cost: the replicated side grows N×
  * — use when that side is small relative to the skewed side's hot share.
  */
object SkewTools {

  /** Deterministic per-row salt in [0, n): hash of the whole row's
    * columns — stable across retries (no rand(), which would break
    * speculative re-execution). */
  def rowSalt(df: DataFrame, n: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(n))

  /** Inner equi-join with a salted shuffle: `skewed` rows each get one
    * salt; `other` is replicated across all `n` salts via one `explode`
    * (no union-of-n-branches rescan). The join shuffles on
    * (keys..., salt), spreading each hot key over n reducers. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      n: Int): DataFrame = {
    require(n > 0, "salt factor must be positive")
    val l = skewed.withColumn("_salt", rowSalt(skewed, n))
    val r = other.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase aggregation for heavy per-key state: phase 1 aggregates on
    * (keys, salt) — n-way parallel even for one hot key — phase 2 merges
    * the n partials per key. The caller supplies BOTH phases, which must
    * compose associatively (e.g. collect_set → flatten+distinct,
    * sum → sum, count → sum).
    *
    * For plain algebraic aggregates Spark's map-side partial aggregation
    * already neutralises skew — reach for this only when the partial
    * state itself is large. */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], n: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    require(n > 0, "salt factor must be positive")
    df.withColumn("_salt", rowSalt(df, n))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Exact distinct count per key, skew-safe: distinct values spread over
    * (key, salt) sub-aggregates, then merged. The classic two-phase
    * instance — a direct `groupBy(key).agg(countDistinct)` funnels every
    * hot-key value through one task. */
  def skewSafeCountDistinct(df: DataFrame, keys: Seq[String],
      valueCol: String, n: Int = 16): DataFrame =
    twoPhaseAgg(df, keys, n,
      partial = Seq(collect_set(col(valueCol)).as("_vals")),
      finalAgg = Seq(size(array_distinct(flatten(collect_list(col("_vals")))))
        .cast("long").as(s"n_distinct_$valueCol")))
}
