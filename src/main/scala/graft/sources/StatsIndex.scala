package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** FILE-level data skipping from parquet footer stats — the metadata
  * layer Delta / Iceberg keep in their log, built from plain parquet
  * and Spark operators.
  *
  * Vanilla Spark prunes ROW GROUPS inside each file once a filter is
  * pushed to the parquet reader, but it still lists, plans and opens
  * every file of the table. At 100 TB (~10⁵ files of ~1 GiB) that is
  * 10⁵ splits planned and 10⁵ footer reads per query. A stats index —
  * one tiny parquet table of per-file min/max — turns a selective scan
  * into: filter the index (metadata-scale, ~10⁵ rows), read only the
  * files that can match. Combined with [[ZOrder]] clustering the index
  * is maximally selective on every clustered column (each file covers a
  * narrow span of each — measured in SCALE.md).
  *
  * Build is DISTRIBUTED: file paths are parallelized and footers read
  * executor-side (`mapPartitions`); nothing driver-side grows with data
  * volume, only with file COUNT — and the collected prune result is the
  * matching file list, which is exactly the object Spark's own
  * planner materializes for any scan.
  *
  * v1 indexes integral columns (the partition/cluster key shape);
  * `readPruned` re-applies the caller's predicate after pruning, so the
  * index is a conservative accelerator — never a correctness surface
  * (`StatsIndexSpec` asserts pruned ≡ full-scan results on random
  * boxes).
  */
object StatsIndex {

  /** One pass over `dataDir`'s footers → an index parquet at
    * `indexDir` with one row per (file, column): row count + long
    * min/max. Missing stats (null-only chunks) produce a full-range
    * row, i.e. the file is never skipped. */
  def build(spark: SparkSession, dataDir: String, cols: Seq[String],
      indexDir: String): Unit = {
    val files = listData(spark, dataDir)
    // repartition, not coalesce(1): coalesce would collapse the footer
    // scan itself into one task (see refresh)
    statsFor(spark, files, cols)
      .repartition(1).write.mode("overwrite").parquet(indexDir)
  }

  /** Incremental maintenance for an append-mostly lake: footer-read
    * ONLY files the index has not seen, drop rows for files that
    * vanished (compaction/expiry), and swap the updated index in via
    * a CHECKED two-rename (previous index parked at `.old` until the
    * new one is in place — a crash mid-swap is recoverable, never a
    * silent loss; raw-FS swaps do leave a brief not-found window for
    * concurrent readers, the gap a transactional commit log closes).
    * Cost ∝ churn, not table size — the operation a daily-ingest
    * 100 TB table actually runs; a full [[build]] per ingest would
    * re-read every footer. Returns (added, removed). */
  def refresh(spark: SparkSession, dataDir: String, cols: Seq[String],
      indexDir: String): (Int, Int) = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    if (!new Path(indexDir).getFileSystem(conf).exists(new Path(indexDir))) {
      build(spark, dataDir, cols, indexDir)
      return (listData(spark, dataDir).size, 0)
    }
    val current = listData(spark, dataDir)
    val old = spark.read.parquet(indexDir)
    val known = old.select(col("file")).distinct().as[String].collect().toSet
    val added = current.filterNot(known)
    val removed = (known -- current).toSeq.sorted
    val kept =
      if (removed.isEmpty) old
      else old.join(removed.toDF("file"), Seq("file"), "left_anti")
    val updated =
      if (added.isEmpty) kept
      else kept.unionByName(statsFor(spark, added, cols))
    val fs = new Path(indexDir).getFileSystem(conf)
    val tmp = new Path(indexDir + ".swap")
    val parked = new Path(indexDir + ".old")
    // repartition (a shuffle), NOT coalesce: coalesce(1) would collapse
    // the footer-read stage itself into one task — the shuffle keeps
    // footer reads parallel and moves only tiny stats rows to the writer
    updated.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    // checked two-rename swap (same contract as ZOrder.optimize): a
    // crash mid-swap leaves the previous index recoverable at `.old`,
    // never silently gone; the brief not-found window for concurrent
    // readers is inherent to raw-FS swaps
    fs.delete(parked, true)
    require(fs.rename(new Path(indexDir), parked),
      s"refresh: could not move $indexDir aside — index untouched")
    require(fs.rename(tmp, new Path(indexDir)),
      s"refresh: could not move new index into $indexDir — " +
        s"old index preserved at $parked (rename it back)")
    fs.delete(parked, true)
    (added.size, removed.size)
  }

  private def listData(spark: SparkSession, dataDir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new Path(dataDir).getFileSystem(conf)
      .listStatus(new Path(dataDir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq.sorted
  }

  /** Distributed footer scan of `files` → one index row per
    * (file, column). */
  private def statsFor(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val colsB = spark.sparkContext.broadcast(cols)
    // ship the session's Hadoop conf to the executors as plain entries
    // (fs.defaultFS, object-store credentials/endpoints, HA nameservice
    // mappings) — a fresh `new Configuration()` on the executor would
    // only ever resolve local/default filesystems
    val confEntries = spark.sparkContext.broadcast(
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray)
    files.toDF("file")
      .repartition(math.max(1, math.min(files.size, 64)))
      .mapPartitions { it =>
        val c = new Configuration(false)
        confEntries.value.foreach { case (k, v) => c.set(k, v) }
        it.map { row =>
          val f = row.getString(0)
          val r = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f), c))
          try {
            val blocks = r.getFooter.getBlocks.asScala
            val nRows = blocks.map(_.getRowCount).sum
            val stats = colsB.value.map { name =>
              val ranges = blocks.flatMap { b =>
                b.getColumns.asScala
                  .find(_.getPath.toDotString == name)
                  .flatMap { cc =>
                    val st = cc.getStatistics
                    if (st == null || !st.hasNonNullValue) None
                    else (st.genericGetMin, st.genericGetMax) match {
                      // v1 indexes integral stats; anything else is
                      // recorded full-range (kept, never skipped)
                      case (lo: Number, hi: Number) =>
                        Some((lo.longValue(), hi.longValue()))
                      case _ => None
                    }
                  }
              }
              if (ranges.isEmpty) (name, Long.MinValue, Long.MaxValue)
              else (name, ranges.map(_._1).min, ranges.map(_._2).max)
            }
            (f, nRows, stats)
          } finally r.close()
        }
      }
      .toDF("file", "row_count", "stats")
      .select(col("file"), col("row_count"),
        explode(col("stats")).as("s"))
      .select(col("file"), col("row_count"), col("s._1").as("col"),
        col("s._2").as("min"), col("s._3").as("max"))
  }

  /** Files whose stats intersect EVERY `[lo, hi]` constraint. A file
    * missing an index row for a constrained column is kept (conservative
    * — e.g. a column added after the index was built). Metadata-scale:
    * the index has #files × #cols rows; the collect is the file list. */
  def prunedFiles(spark: SparkSession, indexDir: String,
      ranges: Seq[(String, Long, Long)]): Seq[String] = {
    import spark.implicits._
    val idx = spark.read.parquet(indexDir)
    val all = idx.select(col("file")).distinct()
    val excluded = ranges.map { case (name, lo, hi) =>
      idx.filter(col("col") === name &&
        (col("max") < lo || col("min") > hi))
        .select(col("file"))
    }.reduceOption(_ union _)
    excluded match {
      case None => all.as[String].collect().toSeq.sorted
      case Some(ex) =>
        all.join(ex.distinct(), Seq("file"), "left_anti")
          .as[String].collect().toSeq.sorted
    }
  }

  /** Scan only the files that can satisfy `ranges`, then re-apply the
    * exact predicate — the index prunes, the filter decides. Row-group
    * pruning inside the surviving files still happens via the pushed
    * filter, so the two layers compose. */
  def readPruned(spark: SparkSession, dataDir: String, indexDir: String,
      ranges: Seq[(String, Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "readPruned needs at least one range")
    val files = prunedFiles(spark, indexDir, ranges)
    val pred = ranges.map { case (name, lo, hi) =>
      col(name).between(lo, hi)
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(dataDir).filter(pred).limit(0)
    else spark.read.parquet(files: _*).filter(pred)
  }
}
