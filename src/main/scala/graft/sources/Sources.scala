package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.schema.StockSchema

/** Bar ingestion (SURVEY.md §2.1).
  *
  * Reference behavior reproduced:
  *  - S1 header CSV scan with comma separator (`G_2_rf_nordd.py:24`,
  *    `G_2_rf_rdd.py:51`). The reference relies on `inferSchema=True`; we read
  *    with the explicit 60-column [[StockSchema.schema]] by default (single
  *    pass, stable types) and keep inference as an opt-in ingest mode.
  *  - S2 smoke path: optional row limit (`G_2_rf_rdd.py:52`, commented
  *    `limit(1000)` debug read).
  *  - legacy time-parser policy, set by every reference script
  *    (`G_2_rf_nordd.py:21`).
  */
object CsvBarSource {

  def load(
      spark: SparkSession,
      path: String,
      schema: StructType = StockSchema.schema,
      inferSchema: Boolean = false,
      limit: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
    val reader = spark.read.option("header", "true").option("sep", ",")
    val df =
      if (inferSchema) reader.option("inferSchema", "true").csv(path)
      else reader.schema(schema).csv(path)
    limit.fold(df)(df.limit)
  }
}

/** Parquet round-trip replacing the reference's RDD pickle file
  * (S3/S4: `G_2_data_exploration.ipynb` cells 45, 47-48 —
  * `rdd.saveAsPickleFile` / `sparkContext.pickleFile` / `toDF`).
  * Parquet keeps the data columnar, splittable and predicate-pushdown-able,
  * which an opaque pickle/object file is not — at 100 TB this is the
  * difference between pruned column scans and full deserialization.
  */
object ParquetRoundTrip {
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

/** JSON-lines round-trip — the interchange format training-data
  * pipelines ingest raw corpora from (beyond the reference's surface).
  * Reading with an EXPLICIT schema skips the whole-file inference
  * pre-scan — at 100 TB, inference doubles the read. */
object JsonlRoundTrip {
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(sc => spark.read.schema(sc).json(path))
}

/** Hive-style partitioned parquet lake layout (`.../day=2020-01-06/...`)
  * — the standard 100 TB table layout. Queries filtering on the
  * partition column prune whole directories BEFORE any I/O
  * (`PartitionFilters` in the scan node, asserted in `SourcesSpec`),
  * which is the difference between scanning one day and scanning eight
  * years. Partition columns should be low-cardinality (day, symbol) —
  * a high-cardinality partition key explodes the file count. */
object PartitionedLake {
  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Clustered write: RANGE-repartition by the cluster key (disjoint
    * key span per file — a hash repartition would scatter every key
    * range across every file), then sort within partitions. Each file
    * AND each parquet row group then covers a narrow key range, so
    * min/max footer statistics skip both for key predicates — data
    * skipping WITHOUT the directory explosion a high-cardinality
    * partition column would cause. Partition on the low-cardinality
    * column (day), cluster on the high-cardinality one (symbol, user). */
  def writeClustered(df: DataFrame, path: String,
      clusterCols: Seq[String], numFiles: Int = 0): Unit = {
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    val rep =
      if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
      else df.repartitionByRange(cols: _*)
    rep.sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }
}

/** Loader for the driver-generated synthetic tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
