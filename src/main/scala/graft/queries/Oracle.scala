package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by the oracle query catalog.
  *
  * Float discipline: the driver hash-compares our parquet output against
  * DuckDB's result, so every aggregated double must be BIT-identical across
  * engines. Double summation is order-dependent; decimal summation is exact
  * and order-free. So: aggregate in DECIMAL (inputs have ≤4 meaningful
  * decimals; products get a deterministic per-element cast), then cast the
  * exact decimal back to DOUBLE at the end. Both engines then emit the same
  * bits. Pass-through (projected) values need no treatment.
  */
object Oracle {

  /** Exact sum of a double column: cast each element to DECIMAL(28,6),
    * sum exactly, return as double. SQL twin: `sumd`. */
  def sumd(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Exact mean: exact decimal sum / count, divided in double space. */
  def avgd(c: Column): Column =
    (sum(c.cast(DecimalType(28, 6))).cast("double") /
      count(c).cast("double"))

  /** DuckDB SQL twin of [[sumd]]. */
  def sqlSumd(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  /** DuckDB SQL twin of [[avgd]]. */
  def sqlAvgd(e: String): String =
    s"(CAST(sum(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE) / CAST(count($e) AS DOUBLE))"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Schema-adaptive `events` loader. Generators have shipped `events.ts`
    * both as parquet TIMESTAMP(NANOS) — which Spark 4 only reads as a raw
    * nanosecond long under `legacy.parquet.nanosAsLong` — and as native
    * micro-precision TIMESTAMP (NTZ or LTZ). Inspect the read schema and
    * normalize every variant to micro-precision TIMESTAMP_NTZ, the type
    * the whole catalog (and the DuckDB oracle) assumes. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.withColumn("ts", normalizeTs(raw, "ts"))
  }

  /** Normalize a timestamp-ish column to TIMESTAMP_NTZ regardless of how
    * the parquet writer encoded it (nanos-as-long, native micros NTZ/LTZ). */
  def normalizeTs(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // legacy nanos-as-long: micro-granular data, so `div 1000` is
        // lossless; DuckDB's TIMESTAMP cast truncates identically
        expr(s"timestamp_micros($colName div 1000)").cast("timestamp_ntz")
      case _ =>
        col(colName).cast("timestamp_ntz")
    }
}
