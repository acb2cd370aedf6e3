package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located joins (builder brief: "bucketing for
  * co-located joins").
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key lets Spark plan the join WITHOUT any Exchange: each bucket
  * pair joins in place. At 100 TB this converts the nightly fact-fact
  * join from a full two-sided shuffle into a metadata decision — the
  * single biggest lever for repeated pipelines over the same keys.
  *
  * Notes that matter at scale:
  *  - both sides must agree on bucket count and key, or Spark falls back
  *    to shuffling the mismatched side;
  *  - buckets also serve as a coarse index: a filter on the bucket key
  *    scans 1/n of the files (bucket pruning);
  *  - `sortBy` within buckets makes the join a streaming merge, no hash
  *    table build.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      nBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
    (if (sorted) w.sortBy(keys.head, keys.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
