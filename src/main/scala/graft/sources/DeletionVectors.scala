package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ deletes — Delta/Iceberg DELETION VECTORS from plain
  * parquet and the existing [[CommitLog]] machinery.
  *
  * Copy-on-write DELETE ([[MergeInto.delete]]) rewrites every file
  * holding a matching row: right when deletes are dense, pathological
  * when they are sparse — a GDPR-style "delete these 1000 users"
  * against a 100 TB lake would rewrite thousands of GB-sized files to
  * remove kilobytes. [[deleteMor]] instead RECORDS the deleted
  * positions: one tiny sidecar parquet under `_dv/` holding
  * `(file, pos)` pairs — the file's name and the row's physical
  * position from Spark's `_metadata.row_index` — and a
  * `.mutation.checkpoint` publishing the SAME data file list (zero
  * data rewritten; history APIs fail fast across it exactly as for a
  * CoW mutation, because row content at that version changed).
  * [[readMor]] is the read surface: the committed view anti-joined
  * against the DV set on `(file name, row position)` — the DV side is
  * tiny, so AQE broadcasts it and the plan is one scan + one
  * broadcast anti-join. [[compact]] applies the vectors physically
  * (rewrites ONLY files that carry DV rows, drops `_dv`), returning
  * the lake to plain-files state.
  *
  * WRITER INTERACTIONS — the part that makes MoR safe, not just fast:
  * every physical rewriter (CoW merge/update/delete, OPTIMIZE,
  * small-file compaction) FAILS FAST while `_dv` is non-empty, because
  * each reads committed files WITHOUT the vectors and would resurrect
  * DV-deleted rows into its rewrite (`MergeInto.mutate`,
  * `ZOrder.optimize`, `compactSmall` all check under the writer lock);
  * run [[compact]] first. Ingest APPENDS compose freely (new files
  * have no vectors). All DV operations hold the same single writer
  * lock as every other lake writer.
  *
  * Read-surface contract: a DV'd lake is read through [[readMor]].
  * The stats index's metadata-first answers (`countPruned`,
  * `minMaxPruned`) and plain `readCommitted` do NOT apply vectors —
  * their file-level stats stay CONSERVATIVE for pruning (a deleted
  * row can only widen bounds), but exact metadata counts require
  * [[compact]] first.
  *
  * Crash windows are self-healing: vectors land in `_dv` before the
  * mutation checkpoint publishes, so a crash between the two leaves
  * extra vectors that the next [[deleteMor]]'s new-pairs diff and
  * [[readMor]]'s anti-join treat idempotently; a crash inside
  * [[compact]] after its checkpoint leaves stale vectors referencing
  * swept files — harmless to reads (no name matches) and cleared by
  * re-running compact. `DeletionVectorsSpec` exercises each. */
object DeletionVectors {

  def dvDir(lakeDir: String): String = s"$lakeDir/_dv"

  /** True when the lake has any recorded (unapplied) vectors. */
  def hasDvs(fs: org.apache.hadoop.fs.FileSystem,
      lakeDir: String): Boolean = {
    val d = new Path(dvDir(lakeDir))
    fs.exists(d) && fs.listStatus(d)
      .exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** The recorded vector set as a DataFrame of `(file, pos)`;
    * empty-schema-safe when no vectors exist. */
  private def vectors(spark: SparkSession, lakeDir: String)
      : Option[DataFrame] = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hasDvs(fs, lakeDir)) None
    else Some(spark.read.parquet(dvDir(lakeDir))
      .select(col("file"), col("pos")).distinct())
  }

  private def fileNameCol: org.apache.spark.sql.Column =
    element_at(split(col("_metadata.file_path"), "/"), -1)

  /** Merge-on-read DELETE: record `(file, pos)` for every committed
    * row matching `predicate` (SQL NULL semantics — NULL keeps the
    * row) instead of rewriting files. Cost ∝ matched ROWS (16-byte
    * pairs through one tiny write), never ∝ touched file bytes — the
    * sparse-delete shape CoW cannot serve. Idempotent: pairs already
    * recorded are not re-written, and the returned count is the NEWLY
    * marked rows (0 on a repeat of the same predicate). Publishes a
    * `.mutation.checkpoint` with the unchanged file list. */
  def deleteMor(spark: SparkSession, lakeDir: String,
      predicate: String): Long = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"deleteMor: $lakeDir has no commit log — cannot publish atomically")
    CommitLog.withWriterLock(fs, lakeDir) {
      val committed = CommitLog.committedNames(fs, lakeDir).toSeq.sorted
      val lake = spark.read
        .parquet(committed.map(n => s"$lakeDir/$n"): _*)
      val hits = lake.filter(coalesce(expr(predicate), lit(false)))
        .select(fileNameCol.as("file"),
          col("_metadata.row_index").as("pos"))
      val fresh = vectors(spark, lakeDir) match {
        case None => hits
        case Some(dv) => hits.join(dv, Seq("file", "pos"), "left_anti")
      }
      // count + write in one materialization: localCheckpoint the tiny
      // pair set so the count never re-runs the predicate scan
      val pairs = fresh.localCheckpoint()
      val n = pairs.count()
      if (n > 0) {
        pairs.repartition(1).write.mode("append")
          .parquet(dvDir(lakeDir))
        val id = math.max(CommitLog.maxCommittedId(fs, lakeDir), -1L)
        CommitLog.commitMutationCheckpoint(fs, lakeDir, id, committed)
      }
      n
    }
  }

  /** The committed view MINUS the recorded vectors — ONE scan plus one
    * (AQE-broadcast) anti-join on `(file name, row position)`. With no
    * vectors this is exactly the plain committed read. */
  def readMor(spark: SparkSession, lakeDir: String,
      mergeSchema: Boolean = false): DataFrame = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = CommitLog.committedNames(fs, lakeDir).toSeq.sorted
    require(committed.nonEmpty, s"readMor: no committed files in $lakeDir")
    val rdr = if (mergeSchema) spark.read.option("mergeSchema", "true")
      else spark.read
    val base = rdr.parquet(committed.map(n => s"$lakeDir/$n"): _*)
    vectors(spark, lakeDir) match {
      case None => base
      case Some(dv) =>
        base
          .withColumn("file", fileNameCol)
          .withColumn("pos", col("_metadata.row_index"))
          .join(dv, Seq("file", "pos"), "left_anti")
          .drop("file", "pos")
    }
  }

  /** [[readMor]] with FILE-LEVEL SKIPPING: the committed ∩
    * index-pruned file list is scanned with the exact predicate
    * re-applied (the [[StatsIndex]] contract), then the vectors
    * anti-join as in [[readMor]] — so a selective probe over a DV'd
    * 100 TB lake reads a handful of files AND never sees a deleted
    * row. The index stays valid under vectors: deleteMor changes no
    * data file, so the file set matches the committed view and the
    * per-file bounds remain conservative (a deleted row can only
    * widen them — pruning never loses a live row). */
  def readMorPruned(spark: SparkSession, lakeDir: String,
      indexDir: String, ranges: Seq[StatsIndex.ColRange]): DataFrame = {
    require(ranges.nonEmpty, "readMorPruned needs at least one range")
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = CommitLog.committedNames(fs, lakeDir)
    val pruned = StatsIndex.prunedTyped(spark, indexDir, ranges)
      .map(p => new Path(p).getName).filter(committed.contains)
    val pred = ranges.map(_.predicate).reduce(_ && _)
    val base =
      if (pruned.isEmpty)
        spark.read.parquet(committed.toSeq.sorted
          .map(n => s"$lakeDir/$n"): _*).filter(pred).limit(0)
      else spark.read.parquet(pruned.sorted
        .map(n => s"$lakeDir/$n"): _*).filter(pred)
    vectors(spark, lakeDir) match {
      case None => base
      case Some(dv) =>
        base
          .withColumn("file", fileNameCol)
          .withColumn("pos", col("_metadata.row_index"))
          .join(dv, Seq("file", "pos"), "left_anti")
          .drop("file", "pos")
    }
  }

  /** Apply the vectors physically: rewrite ONLY the files that carry
    * DV rows (each minus its deleted positions), carry everything
    * else by name, publish one mutation checkpoint, drop `_dv`, sweep
    * the replaced files — the lake is plain files again and every
    * CoW/OPTIMIZE path unblocks. Bounded by the DV'd file set, not
    * the lake. Returns (filesRewritten, filesCarried). */
  def compact(spark: SparkSession, lakeDir: String,
      filesPerRewrite: Int = 4,
      indexDir: Option[String] = None): (Int, Int) = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"compact: $lakeDir has no commit log — cannot publish atomically")
    CommitLog.withWriterLock(fs, lakeDir) {
      import spark.implicits._
      val committed = CommitLog.committedNames(fs, lakeDir).toSeq.sorted
      val dvOpt = vectors(spark, lakeDir)
      val touched: Seq[String] = dvOpt match {
        case None => Seq.empty
        case Some(dv) => dv.select(col("file")).distinct()
          .as[String].collect().toSeq.sorted.filter(committed.contains)
      }
      if (touched.isEmpty) {
        // stale or absent vectors (e.g. a crashed earlier compact):
        // nothing to apply — just clear the sidecar
        fs.delete(new Path(dvDir(lakeDir)), true)
        (0, committed.size)
      } else {
        val dv = dvOpt.get
        val survivors = spark.read
          .parquet(touched.map(n => s"$lakeDir/$n"): _*)
          .withColumn("file", fileNameCol)
          .withColumn("pos", col("_metadata.row_index"))
          .join(dv, Seq("file", "pos"), "left_anti")
          .drop("file", "pos")
        val carried = committed.filterNot(touched.toSet)
        val before = CommitLog.dataFileNames(fs, lakeDir)
        survivors.repartition(filesPerRewrite)
          .write.mode("append").parquet(lakeDir)
        val freshFiles =
          (CommitLog.dataFileNames(fs, lakeDir) -- before).toSeq.sorted
        val id = math.max(CommitLog.maxCommittedId(fs, lakeDir), -1L)
        CommitLog.commitMutationCheckpoint(fs, lakeDir, id,
          (carried ++ freshFiles).sorted)
        fs.delete(new Path(dvDir(lakeDir)), true)
        CommitLog.vacuum(fs, lakeDir, olderThanMs = 0L)
        indexDir.foreach(idx =>
          StatsIndex.refreshSameColumns(spark, lakeDir, idx))
        (touched.size, carried.size)
      }
    }
  }
}
