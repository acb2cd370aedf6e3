package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Materialization helpers shared by the mutation verbs (r15).
  *
  * Every verb follows the same shape: pin a small derived frame
  * (`localCheckpoint`) so later passes read memory instead of
  * re-executing the plan, then COUNT it to size the publish. The
  * post-pin `count()` was a separate Spark job per verb — pure fixed
  * cost (the data is already in cached blocks) that dominated
  * churn-sized mutations and per-micro-batch streaming upserts
  * (measured: 4 standalone count jobs per qs19 micro-batch). These
  * helpers piggyback the aggregate on the MATERIALIZATION job itself
  * via a NAMED `Dataset.observe` — one pass, no second job, identical
  * results.
  *
  * Deliberately NOT the `Observation` helper class: instantiating one
  * touches the session's lazy `observationManager`, and once that
  * lazy field is initialized the session no longer Java-serializes —
  * every LATER closure capturing a SparkSession (ml model training
  * summaries do) dies with `Task not serializable`. Named observe +
  * reading `queryExecution.observedMetrics` after the action never
  * touches the manager. */
private[sources] object Pins {

  /** `df.localCheckpoint()` + one observed aggregate row, collected
    * DURING the materialization job. */
  private def pinObserved(df: DataFrame, aggs: Column*): (DataFrame, Row) = {
    val name = s"__pin_${java.util.UUID.randomUUID()}"
    val named = df.observe(name, aggs.head, aggs.tail: _*)
    val pinned = named.localCheckpoint()
    (pinned, named.queryExecution.observedMetrics(name))
  }

  /** `df.localCheckpoint()` + its row count, counted DURING the
    * materialization job. */
  def pinCounted(df: DataFrame): (DataFrame, Long) = {
    val (pinned, m) = pinObserved(df, count(lit(1)))
    (pinned, m.getLong(0))
  }

  /** `df.localCheckpoint()` + the distinct values of string column
    * `c`, collected DURING the materialization job (for
    * metadata-bounded columns — file names — only). */
  def pinWithDistinct(df: DataFrame, c: String): (DataFrame, Seq[String]) = {
    val (pinned, m) = pinObserved(df, collect_set(col(c)))
    (pinned, m.getSeq[String](0))
  }

  /** The uniqueness gate and the row count in ONE job (the gate's
    * groupBy already touches every row — riding the total on it makes
    * the verb's separate `count()` job redundant). Fails exactly as
    * [[MergeInto.requireUniqueKeys]]; returns the total row count. */
  def requireUniqueKeysCounted(updates: DataFrame, keys: Seq[String],
      verb: String): Long = {
    require(keys.nonEmpty, s"$verb needs at least one key column")
    val r = updates.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("__total"), max(col("__n")).as("__max"))
      .head()
    val total = if (r.isNullAt(0)) 0L else r.getLong(0)
    val maxPer = if (r.isNullAt(1)) 0L else r.getLong(1)
    require(maxPer <= 1L,
      s"$verb: duplicate keys in updates on (${keys.mkString(", ")}) — " +
        "each duplicate would race to replace the same row")
    total
  }
}
