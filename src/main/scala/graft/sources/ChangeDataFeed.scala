package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style CHANGE DATA FEED: row-level deltas across DML, the
  * surface [[CommitLog.changedNames]] deliberately refuses to fake.
  *
  * The add-only CDC view ([[graft.streaming.LayoutSink.readChanges]])
  * fails fast at any mutation — an added-files delta cannot express
  * "this row changed in place". With the feed ENABLED
  * ([[enable]] — Delta's `delta.enableChangeDataFeed` table
  * property), every copy-on-write DML verb ([[MergeInto]]) writes its
  * row-level changes to `_cdf/<id>.<gen>/` BEFORE publishing the
  * mutation checkpoint that claims the same `(id, gen)` version key,
  * all under the one writer lock — so a published mutation always has
  * its change rows, and a crashed writer leaves only an orphan
  * directory no published version points at (overwritten by the next
  * writer that claims the key, unreadable until then). Change volume
  * is ∝ changed rows, never table size — the Delta CDF cost shape.
  *
  * Version keys: an APPEND commits manifest `<id>` = version
  * `(id, 0)`; a checkpoint commits at `(id, gen)` with `gen` strictly
  * increasing across all checkpoints. Lexicographic `(id, gen)` order
  * IS commit order (a mutation reuses the current max id but takes a
  * higher gen; a later append takes a higher id), so a feed cursor is
  * a [[Version]], not a bare batch id — the cursor a bare id cannot
  * express is "the append at id 2, but not the mutation that later
  * rewrote rows at id 2".
  *
  * [[read]] serves `(from, to]`:
  *  - append manifests in range as `insert` rows, read from the
  *    committed data files themselves (no copy — Delta also writes no
  *    CDC files for insert-only commits). A later mutation SWEEPS the
  *    files it rewrites, so insert segments are only readable while
  *    their files live: a swept file fails fast with a resync message
  *    (Delta's VACUUM-ate-my-CDF error, with an immediate rather than
  *    retention-delayed horizon for rewritten files).
  *  - DML mutation checkpoints in range from their `_cdf` directories
  *    (`update_preimage`/`update_postimage`/`delete`/`insert` rows) —
  *    a mutation that ran before [[enable]] fails fast.
  *  - any history-TRUNCATING checkpoint (fold/OPTIMIZE/compaction)
  *    above the cursor fails fast — per-version attribution is gone,
  *    same contract as [[CommitLog.changedNames]]. Pure-layout
  *    rewrites preserve every row, so they never appear IN the feed;
  *    they only bound how far back a cursor may lag.
  *
  * Output schema: the data columns under their LOGICAL names
  * ([[ColumnMapping]], like every committed read; unioned by name
  * across segments — additive schema evolution surfaces as NULLs on
  * older segments, dropped columns vanish) plus `_change_type`,
  * `_commit_id`, `_commit_gen`.
  *
  * Lifecycle: enablement is PER LAKE (a clone starts disabled — its
  * log is its own); directories whose `(id, gen)` no live checkpoint
  * claims (crash debris, folded-away history) age into
  * [[CommitLog.vacuum]]'s sweep; [[versionAt]] gives wall-clock
  * cursors (Delta's `startingTimestamp`); [[graft.streaming
  * .FeedStream]] is the live consumer. */
object ChangeDataFeed {

  /** A committed version key — see the ordering contract above. */
  final case class Version(id: Long, gen: Long) extends Ordered[Version] {
    def compare(that: Version): Int = {
      val c = java.lang.Long.compare(id, that.id)
      if (c != 0) c else java.lang.Long.compare(gen, that.gen)
    }
  }
  object Version {
    /** Exclusive-from cursor meaning "everything ever committed". */
    val Start: Version = Version(Long.MinValue, 0L)
  }

  val ChangeTypeCol = "_change_type"
  val CommitIdCol = "_commit_id"
  val CommitGenCol = "_commit_gen"

  /** The TYPED "this window cannot be served" failure — a truncating
    * checkpoint past the cursor, a mutation with no change data (ran
    * pre-enablement, or a RESTORE), or a swept insert segment.
    * Consumers that can degrade ([[IncrementalView.refreshFeed]]'s
    * full rebuild) match THIS type, never message text — any other
    * IllegalArgumentException (an empty-range cursor, a missing log)
    * is caller error and must propagate. */
  final class FeedUnservableException(msg: String)
    extends IllegalArgumentException(msg)

  private[sources] def cdfRoot(lakeDir: String): Path =
    new Path(lakeDir, "_cdf")
  private[sources] def cdfDir(lakeDir: String, id: Long, gen: Long): Path =
    new Path(cdfRoot(lakeDir), s"$id.$gen")
  private def marker(lakeDir: String): Path =
    new Path(CommitLog.logDir(lakeDir), "cdf.enabled")

  /** Turn the feed on (idempotent). Only mutations AFTER this write
    * change rows — a feed cursor cannot reach across an earlier
    * mutation, exactly Delta's enablement semantics. */
  def enable(spark: SparkSession, lakeDir: String): Unit = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"enable change feed: $lakeDir has no commit log")
    val p = marker(lakeDir)
    if (!fs.exists(p)) { fs.create(p, true).close() }
  }

  def isEnabled(fs: org.apache.hadoop.fs.FileSystem,
      lakeDir: String): Boolean = fs.exists(marker(lakeDir))

  /** The newest committed version key — the natural `toInclusive`. */
  def currentVersion(spark: SparkSession, lakeDir: String): Version = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (ckpts, manifests) = CommitLog.listLog(fs, lakeDir)
    val keys =
      ckpts.map(s => CommitLog.ckptKey(s.getPath.getName)) ++
        manifests.map(s => (CommitLog.recordId(s.getPath.getName), 0L))
    require(keys.nonEmpty, s"change feed: $lakeDir has no commits")
    val (i, g) = keys.max
    Version(i, g)
  }

  /** TIMESTAMP-ADDRESSED cursor — Delta's `startingTimestamp`: the
    * newest version PUBLISHED at-or-before `tsMs` (record modification
    * times, the same clock [[CommitLog.committedViewAtTime]] and
    * retention run on), so `read(versionAt(ts), current)` serves
    * exactly the changes after wall-clock `ts`. Fails loudly when
    * `tsMs` predates the first live record — expired history and
    * never-existed look identical to the caller, and a silent
    * everything-since-genesis answer would re-serve the world. */
  def versionAt(spark: SparkSession, lakeDir: String,
      tsMs: Long): Version = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val recs = CommitLog.history(fs, lakeDir)
    require(recs.nonEmpty,
      s"change feed at $tsMs: $lakeDir has no commit log records")
    val at = recs.filter(_.modifiedMs <= tsMs)
    require(at.nonEmpty,
      s"change feed at $tsMs: before the first live record (oldest = " +
        s"${recs.map(_.modifiedMs).min}) — either the lake did not " +
        "exist yet or that history was expired/folded")
    // publish order: (id, manifest < checkpoint, gen) — the feed's
    // version order, with the manifest-below-checkpoint tiebreak for
    // a same-(id, gen) restore record
    val v = at.sortBy(r =>
      (r.id, if (r.kind == "manifest") 0 else 1, r.gen)).last
    Version(v.id, if (v.kind == "manifest") 0L else v.gen)
  }

  /** A mutation verb's pre-publish change write (writer lock held;
    * `(id, gen)` is the key the caller's checkpoint publish will
    * claim). Any same-key directory is a crashed precursor's debris —
    * replaced wholesale. */
  private[sources] def writeChanges(spark: SparkSession, lakeDir: String,
      id: Long, gen: Long, changes: DataFrame): Unit = {
    val dir = cdfDir(lakeDir, id, gen)
    changes.write.mode("overwrite").parquet(dir.toString)
  }

  /** A row-preserving maintenance publisher's stamp
    * ([[DeletionVectors.compact]], small-file compaction): the live
    * view is unchanged, so the mutation checkpoint gets an EMPTY
    * change set under its (id, gen) — feed cursors read straight
    * through the compaction instead of failing on a missing
    * directory. [[CommitLog.restore]] deliberately does NOT stamp:
    * a rollback changes the view in a way no row-delta expresses, and
    * its consumers must resync. */
  private[sources] def writeEmpty(spark: SparkSession, lakeDir: String,
      id: Long, gen: Long): Unit =
    writeChanges(spark, lakeDir, id, gen,
      spark.range(0).select(lit("").as(ChangeTypeCol)))

  /** The OCC twin of [[writeChanges]]: the change rows were staged
    * UNLOCKED against a pinned snapshot ([[Occ]]'s shape); the commit
    * section — snapshot verified unchanged, lock held, `(id, gen)`
    * about to be claimed — renames them into place in one move. Any
    * same-key directory is crash debris, replaced. */
  private[sources] def publishStaged(fs: org.apache.hadoop.fs.FileSystem,
      lakeDir: String, id: Long, gen: Long, stagedDir: String): Unit = {
    val dst = cdfDir(lakeDir, id, gen)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.mkdirs(cdfRoot(lakeDir))
    require(fs.rename(new Path(stagedDir), dst),
      s"change feed: could not publish ${dst.getName}")
  }

  /** Row-level changes in `(fromExclusive, toInclusive]` — see the
    * object doc for the served segments and fail-fast contract. */
  def read(spark: SparkSession, lakeDir: String,
      fromExclusive: Version,
      toInclusive: Version): DataFrame = {
    require(fromExclusive <= toInclusive,
      s"change feed: empty range ($fromExclusive, $toInclusive]")
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"change feed: $lakeDir has no commit log")
    val (ckpts, manifests) = CommitLog.listLog(fs, lakeDir)
    ckpts.find { s =>
      val n = s.getPath.getName
      CommitLog.truncatesBelow(n) && {
        val (i, g) = CommitLog.ckptKey(n)
        Version(i, g) > fromExclusive
      }
    }.foreach { s =>
      throw new FeedUnservableException(
        s"change feed after $fromExclusive: checkpoint " +
          s"${s.getPath.getName} truncated per-version attribution — " +
          "resync with a full read, then cursor from currentVersion")
    }
    def inRange(v: Version): Boolean =
      v > fromExclusive && v <= toInclusive
    // DML mutations in range, from their _cdf directories
    val mutationSegs: Seq[DataFrame] = ckpts
      .filter(s => CommitLog.isMutation(s.getPath.getName) &&
        !CommitLog.truncatesBelow(s.getPath.getName))
      .map(s => CommitLog.ckptKey(s.getPath.getName))
      .filter { case (i, g) => inRange(Version(i, g)) }
      .sorted
      .map { case (i, g) =>
        val dir = cdfDir(lakeDir, i, g)
        if (!fs.exists(dir))
          throw new FeedUnservableException(
            s"change feed: mutation $i.$g has no change data — it " +
              "ran before the feed was enabled, or is a RESTORE " +
              "(which never captures changes); resync with a full read")
        spark.read.parquet(dir.toString)
          .withColumn(CommitIdCol, lit(i))
          .withColumn(CommitGenCol, lit(g))
      }
    // appends in range, read as inserts from the files themselves
    val insertSegs: Seq[DataFrame] = manifests
      .map(s => (CommitLog.recordId(s.getPath.getName), s))
      .filter { case (i, _) => inRange(Version(i, 0L)) }
      .sortBy(_._1)
      .map { case (i, s) =>
        val names = CommitLog.readRecord(fs, s)
          .filter(CommitLog.isDataEntry).sorted
        // resolve through the clone chain — a shallow clone's
        // committed names live in its SOURCE directory
        val paths = CommitLog.resolveDataPaths(fs, lakeDir, names)
        names.zip(paths).find { case (_, p) =>
          !fs.exists(new Path(p))
        }.foreach { case (n, _) =>
          throw new FeedUnservableException(
            s"change feed: append batch $i's file $n was rewritten " +
              "by a later mutation and swept — the insert segment is " +
              "gone (resync with a full read, then cursor from " +
              "currentVersion)")
        }
        val base =
          if (names.isEmpty)
            // an empty append still yields a typed, zero-row segment
            graft.streaming.LayoutSink.readCommitted(spark, lakeDir)
              .limit(0)
          else spark.read.option("mergeSchema", "true")
            .parquet(paths: _*)
        base.withColumn(ChangeTypeCol, lit("insert"))
          .withColumn(CommitIdCol, lit(i))
          .withColumn(CommitGenCol, lit(0L))
      }
    val segs = mutationSegs ++ insertSegs
    // zero-row schema anchor: every window carries the CURRENT lake
    // columns (+ the feed's meta columns) even when its only segment
    // is narrower — an empty compaction stamp, or a pre-evolution
    // mutation — so consumers can always select data columns
    val anchor =
      graft.streaming.LayoutSink.readCommitted(spark, lakeDir).limit(0)
        .withColumn(ChangeTypeCol, lit(""))
        .withColumn(CommitIdCol, lit(0L))
        .withColumn(CommitGenCol, lit(0L))
    // logical names out, like every committed read: each segment maps
    // physical → logical individually (the anchor is already logical —
    // readCommitted maps; identity on unmapped lakes; the feed's meta
    // columns pass through as unknowns)
    segs.map(ColumnMapping.toLogical(spark, lakeDir, _))
      .foldLeft(anchor)(
        (a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
