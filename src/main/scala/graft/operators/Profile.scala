package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality sweep a training-data pipeline
  * runs before ingest (generalises the reference's duplicate/null guards,
  * ipynb cells 15/17, from boolean checks to a per-column report).
  *
  * One aggregation job for ALL columns: per column null count + exact
  * distinct count, unpivoted to one row per column with `stack`. The
  * multi-distinct aggregate plans as a single Expand + partial-aggregate
  * pass — no per-column scans, no driver loop; at scale swap
  * `count_distinct` for `approx_count_distinct` (same shape, no Expand).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      val nd =
        if (approxDistinct) approx_count_distinct(col(c))
        else count_distinct(col(c))
      Seq(
        (count(lit(1)) - count(col(c))).as(s"_nn_$c"),
        nd.as(s"_nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', _nn_$c, _nd_$c")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct)")
  }
}
