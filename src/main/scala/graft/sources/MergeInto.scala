package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COPY-ON-WRITE `MERGE INTO` / `DELETE` over a commit-logged lake —
  * the mutation primitive Delta/Iceberg put beside time travel and
  * vacuum, built from the same [[CommitLog]] records.
  *
  * The 100 TB shape: a merge must NOT rewrite the table. Touched-file
  * discovery is a semi-join of the lake's key columns + Spark's
  * `_metadata.file_path` against the update keys — one shuffle over
  * keys only (column-pruned scan), collecting at most #files names.
  * Only files that actually contain a matched key are rewritten
  * (scan cost ∝ touched data); every other file is carried into the
  * new table version BY NAME, zero I/O. The new version is published
  * as one [[CommitLog.commitCheckpoint]] — readers see the old table
  * or the new one, never a mix — and the replaced files become
  * uncommitted, i.e. exactly what [[CommitLog.vacuum]] sweeps after
  * its safety horizon. Like any checkpoint publish, a merge truncates
  * time travel below it (the documented fold-horizon contract).
  *
  * Matched-key semantics are Delta's defaults: an update row whose
  * key exists REPLACES every lake row with that key (whenMatched
  * update-all); an update row whose key is absent is INSERTED
  * (whenNotMatched insert-all). Duplicate keys in `updates` fail
  * fast — each would race to replace the same row (Delta raises the
  * same error). */
object MergeInto {

  /** Upsert `updates` (full lake schema, unique on `keys`) into the
    * lake. With `evolveSchema`, `updates` may ADD columns beyond the
    * lake's schema: rewritten/inserted rows carry them, carried files
    * keep their old physical schema (zero I/O either way), and
    * readers opt in via `readCommitted(mergeSchema = true)` — exactly
    * Delta's additive `mergeSchema` evolution; surprise extra columns
    * without the flag fail fast. Returns
    * (filesRewritten, filesCarried). */
  def merge(spark: SparkSession, lakeDir: String, updates: DataFrame,
      keys: Seq[String], filesPerRewrite: Int = 4,
      evolveSchema: Boolean = false): (Int, Int) = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"merge: $lakeDir has no commit log — cannot publish atomically")
    val dupes = updates.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupes == 0,
      s"merge: duplicate keys in updates on (${keys.mkString(", ")}) — " +
        "each duplicate would race to replace the same row")
    // single-writer: a concurrent CoW mutation reading the same base
    // version would have its publish silently dropped by ours
    CommitLog.withWriterLock(fs, lakeDir) {
    val committed = CommitLog.committedNames(fs, lakeDir).toSeq.sorted
    val lake = spark.read.parquet(committed.map(n => s"$lakeDir/$n"): _*)
    val missing = lake.columns.toSet -- updates.columns.toSet
    require(missing.isEmpty,
      s"merge: updates lack lake columns ${missing.toSeq.sorted
        .mkString(", ")} — an update row must be a full row (partial " +
        "updates would silently null the rest)")
    val added = updates.columns.toSet -- lake.columns.toSet
    require(added.isEmpty || evolveSchema,
      s"merge: updates add columns ${added.toSeq.sorted.mkString(", ")} " +
        "not in the lake schema — pass evolveSchema = true to evolve " +
        "additively (readers then need mergeSchema = true)")
    // touched-file discovery: keys + file path only (column-pruned),
    // one semi-join shuffle, collect bounded by #files
    val touched = lake
      .select(col("_metadata.file_path").as("__file") +: keys.map(col): _*)
      .join(updates.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .select(col("__file")).distinct()
      .collect().map(r => new Path(r.getString(0)).getName).toSet
    val carried = committed.filterNot(touched)
    // rewrite = touched rows that keep their version (anti-join on
    // keys) + every update row (matched rows replaced, new keys
    // inserted); written as ordinary appends, then published below
    val before = CommitLog.dataFileNames(fs, lakeDir)
    // no broadcast hint: the update keyset is usually tiny and AQE
    // converts the anti-join to broadcast at runtime; a genuinely
    // large keyset sort-merges instead of OOMing an executor
    // allowMissingColumns only matters under evolveSchema: survivors
    // from old files take NULL for the added columns (additive
    // evolution's backfill value)
    val survivors =
      if (touched.isEmpty) updates
      else spark.read
        .parquet(touched.toSeq.sorted.map(n => s"$lakeDir/$n"): _*)
        .join(updates.select(keys.map(col): _*).distinct(), keys,
          "left_anti")
        .unionByName(updates, allowMissingColumns = true)
    survivors.repartition(filesPerRewrite)
      .write.mode("append").parquet(lakeDir)
    val fresh = (CommitLog.dataFileNames(fs, lakeDir) -- before).toSeq.sorted
    publish(fs, lakeDir, carried ++ fresh)
    (touched.size, carried.size)
    }
  }

  /** Copy-on-write DELETE: drop every committed row matching
    * `predicate` (a SQL boolean expression). Only files containing a
    * matching row are rewritten. Returns (filesRewritten,
    * filesCarried). */
  def delete(spark: SparkSession, lakeDir: String,
      predicate: String, filesPerRewrite: Int = 4): (Int, Int) = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"delete: $lakeDir has no commit log — cannot publish atomically")
    CommitLog.withWriterLock(fs, lakeDir) {
    val committed = CommitLog.committedNames(fs, lakeDir).toSeq.sorted
    val lake = spark.read.parquet(committed.map(n => s"$lakeDir/$n"): _*)
    val touched = lake
      .filter(expr(predicate))
      .select(col("_metadata.file_path")).distinct()
      .collect().map(r => new Path(r.getString(0)).getName).toSet
    val carried = committed.filterNot(touched)
    val before = CommitLog.dataFileNames(fs, lakeDir)
    if (touched.nonEmpty) {
      // keep rows where the predicate is FALSE OR NULL — a NULL
      // evaluation does not "match", so the row survives (SQL DELETE
      // semantics; a bare !pred would silently drop NULL rows)
      spark.read.parquet(touched.toSeq.sorted.map(n => s"$lakeDir/$n"): _*)
        .filter(!coalesce(expr(predicate), lit(false)))
        .repartition(filesPerRewrite)
        .write.mode("append").parquet(lakeDir)
    }
    val fresh = (CommitLog.dataFileNames(fs, lakeDir) -- before).toSeq.sorted
    publish(fs, lakeDir, carried ++ fresh)
    (touched.size, carried.size)
    }
  }

  /** Copy-on-write UPDATE: `SET col = <sql-expr>` for every committed
    * row matching `predicate` — the third DML verb beside merge and
    * delete. Only files containing a matching row are rewritten;
    * non-matching rows in those files pass through byte-identically;
    * assignments are evaluated against the PRE-update row (standard
    * UPDATE semantics — `set` entries never see each other) and cast
    * back to the column's type so the schema cannot drift. Returns
    * (filesRewritten, filesCarried). */
  def update(spark: SparkSession, lakeDir: String, predicate: String,
      set: Map[String, String], filesPerRewrite: Int = 4): (Int, Int) = {
    require(set.nonEmpty, "update needs at least one SET assignment")
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"update: $lakeDir has no commit log — cannot publish atomically")
    CommitLog.withWriterLock(fs, lakeDir) {
    val committed = CommitLog.committedNames(fs, lakeDir).toSeq.sorted
    val lake = spark.read.parquet(committed.map(n => s"$lakeDir/$n"): _*)
    val unknown = set.keySet -- lake.columns.toSet
    require(unknown.isEmpty,
      s"update: SET names unknown columns ${unknown.toSeq.sorted
        .mkString(", ")}")
    val touched = lake
      .filter(expr(predicate))
      .select(col("_metadata.file_path")).distinct()
      .collect().map(r => new Path(r.getString(0)).getName).toSet
    val carried = committed.filterNot(touched)
    val before = CommitLog.dataFileNames(fs, lakeDir)
    if (touched.nonEmpty) {
      val matches = coalesce(expr(predicate), lit(false))
      val cols = lake.schema.fields.map { f =>
        set.get(f.name) match {
          case Some(e) =>
            when(matches, expr(e).cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }
      spark.read.parquet(touched.toSeq.sorted.map(n => s"$lakeDir/$n"): _*)
        .select(cols.toIndexedSeq: _*)
        .repartition(filesPerRewrite)
        .write.mode("append").parquet(lakeDir)
    }
    val fresh = (CommitLog.dataFileNames(fs, lakeDir) -- before).toSeq.sorted
    publish(fs, lakeDir, carried ++ fresh)
    (touched.size, carried.size)
    }
  }

  /** One atomic version flip: a checkpoint at (max id on disk, next
    * gen) naming exactly the new table's files. Replaced files drop
    * out of the committed view the instant the rename lands. */
  private def publish(fs: org.apache.hadoop.fs.FileSystem,
      lakeDir: String, files: Seq[String]): Unit = {
    val id = math.max(CommitLog.maxCommittedId(fs, lakeDir), 0L)
    CommitLog.commitCheckpoint(fs, lakeDir, id, files.sorted)
  }
}
