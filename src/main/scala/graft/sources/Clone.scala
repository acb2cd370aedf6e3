package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** SHALLOW CLONE — Delta's `CREATE TABLE ... SHALLOW CLONE` shape: a
  * new lake whose commit log REFERENCES the source's committed data
  * files (and covered deletion-vector sidecars) instead of copying
  * them. Cloning a 100 TB table costs one metadata write, and the
  * clone is immediately a full table: every verb in this package works
  * on it — reads, time travel, MERGE/UPDATE/DELETE (CoW and MoR),
  * constraints, restore, history — because they all resolve committed
  * NAMES through [[CommitLog.resolveDataPaths]]: a name physically
  * under the clone wins (fresh writes land there), anything else
  * resolves against the recorded source.
  *
  * The branch-for-experiments contract (exactly Delta's):
  *
  *  - a clone MUTATION never touches the source: rewrites and delta
  *    files are written under the clone; replaced source files simply
  *    stop being referenced by the clone's log (they stay committed in
  *    the source — the clone's sweep is [[CommitLog.vacuum]], which
  *    lists only the clone's own directory);
  *  - a SOURCE APPEND is invisible to the clone (its log pins the
  *    names captured at clone time) and breaks nothing;
  *  - a SOURCE physical rewrite — CoW DML, OPTIMIZE, compaction — or a
  *    vacuum that reclaims files the clone references BREAKS the clone
  *    LOUDLY: the clone's reads fail naming the missing file, and
  *    [[CommitLog.restore]] on the clone fails fast ("reclaimed").
  *    This is Delta's documented shallow-clone hazard verbatim (its
  *    VACUUM on the source invalidates shallow clones the same way);
  *    [[materialize]] is the escape hatch — run it before mutating the
  *    source, or clone from sources that are append-only/immutable
  *    (the training-snapshot case this exists for).
  *
  * The clone BOOTSTRAPS at the log's grandfather id `-1` (the
  * convention the sink's bootstrap manifest already owns), so an
  * independently-counting writer — a streaming sink's epoch starting
  * at batch 0 — commits above it without replay-idempotence ever
  * seeing its batches as already-committed. A source with covered
  * deletion vectors clones as a MUTATION checkpoint carrying the
  * `dv:` coverage (the view is not expressible as a bare file list;
  * time-travel/CDC fail fast across it exactly as they do on the
  * source — a fresh clone has no earlier cursors, so the marker is
  * vacuous until it matters).
  *
  * CHECK constraints travel: the source's current definitions are
  * replicated into the clone's log at clone time (then evolve
  * independently — Delta clones table properties the same way).
  * Stats indexes TRAVEL on request (r10):
  * [[StatsIndex.adoptClone]] publishes the source's current index
  * generation as the branch's own — one metadata copy, validated
  * against the clone's committed view; pruned reads then resolve the
  * indexed names through the same local-first chain as every other
  * verb. Without adoption, the un-indexed clone falls back to
  * full-pass discovery (every DML/pruned-read path refuses a stale
  * index) until one is built after [[materialize]]; after BRANCH DML
  * an adopted index is refused the same way until refreshed.
  *
  * [[DeletionVectors.readMorStream]] serves shallow clones too
  * (r10): one pinned file stream per clone-chain hop, each
  * semi-joined against the names that resolve there — every
  * composition edge on the branch surface now works. */
object Clone {

  /** The source lake `dir` shallow-clones, if any. */
  def sourceOf(spark: SparkSession, dir: String): Option[String] = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.cloneSourceOf(fs, dir)
  }

  def isClone(spark: SparkSession, dir: String): Boolean =
    sourceOf(spark, dir).nonEmpty

  /** Create `cloneDir` as a zero-copy clone of `sourceDir`'s CURRENT
    * committed view — or, with `asOf`, of a TIME-TRAVEL snapshot
    * (Delta's `CLONE ... VERSION AS OF`: branch from "last night's
    * version" without touching the live table). The as-of arm
    * resolves through [[CommitLog.committedViewAt]] — since r10 that
    * reaches ACROSS later DML mutations (their records sweep nothing)
    * and serves DV-carrying versions (the clone bootstraps with the
    * `dv:` coverage, exactly like the current-view arm); it FAILS
    * FAST past a truncating fold, or when retention already reclaimed
    * the version's bytes. Metadata-only either way:
    * one pointer write + one bootstrap record (+ the constraint and
    * generated-column definitions, if any) — no data bytes move,
    * whatever the table's size. Runs under the SOURCE's writer lock
    * so the captured view cannot tear against a concurrent mutation.
    * The target must be fresh (no commit log, no data files). Returns
    * (dataFilesReferenced, dvFilesReferenced). */
  def shallow(spark: SparkSession, sourceDir: String,
      cloneDir: String, asOf: Option[Long] = None): (Int, Int) = {
    val fs = new Path(sourceDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(sourceDir))) &&
      CommitLog.recordCount(fs, sourceDir) > 0,
      s"clone: $sourceDir has no commit log — only committed lakes " +
        "can be cloned (the clone's view is the committed view)")
    val srcQ = fs.makeQualified(new Path(sourceDir)).toString
    val dstQ = fs.makeQualified(new Path(cloneDir)).toString
    require(srcQ != dstQ, s"clone: source and target are the same dir")
    // the TARGET's writer lock is the torn-clone mutual-exclusion
    // point: two concurrent shallow() calls into the same target
    // (possibly from different sources) would otherwise both pass the
    // freshness checks and interleave pointer/definition/bootstrap
    // writes — one lake's pointer with another's bootstrap record.
    // One of them fails fast here instead. Target-then-source order;
    // both locks are fail-fast, so cross-order acquisition cannot
    // deadlock, only reject.
    CommitLog.withWriterLock(fs, cloneDir) {
    // a log dir with COMMITTED records is an existing lake — never
    // overwrite; a log dir with zero records is a crashed half-clone
    // (pointer and/or definitions written, bootstrap never published)
    // — sweep its debris and retry self-healingly
    if (fs.exists(new Path(CommitLog.logDir(cloneDir)))) {
      require(CommitLog.recordCount(fs, cloneDir) == 0,
        s"clone: $cloneDir already has a commit log — refusing to " +
          "overwrite an existing lake")
      fs.delete(CommitLog.cloneSourcePath(cloneDir), false)
      CommitLog.invalidateCloneSource(fs, cloneDir)
      DefRecords.allFiles(fs, cloneDir,
        Seq(Constraints.Prefix, GeneratedColumns.Prefix,
          ColumnMapping.Prefix))
        .foreach { p => fs.delete(p, false); () }
    }
    require(CommitLog.dataFileNames(fs, cloneDir).isEmpty,
      s"clone: $cloneDir already holds data files — the target must " +
        "be fresh (name collisions would shadow source files)")
    require(DeletionVectors.dvFilesOnDisk(fs, cloneDir).isEmpty,
      s"clone: $cloneDir already holds _dv sidecar files — stale " +
        "sidecar debris would shadow same-named source sidecars and " +
        "corrupt the MoR read (local-wins resolution)")
    CommitLog.withWriterLock(fs, sourceDir) {
      // the as-of arm serves the version AS PUBLISHED at that id —
      // files AND covered deletion vectors (committedViewAt resolves
      // across later DML mutations since r10), so branching "the
      // table as of before yesterday's backfill", DV state included,
      // is one metadata write like every other clone
      val (files, dv) = asOf match {
        case None => CommitLog.committedView(fs, sourceDir)
        case Some(id) => CommitLog.committedViewAt(fs, sourceDir, id)
      }
      require(files.nonEmpty,
        s"clone: $sourceDir has no committed files — nothing to clone")
      val defs = Constraints.list(fs, sourceDir)
      val genDefs = GeneratedColumns.list(fs, sourceDir)
      fs.mkdirs(new Path(cloneDir))
      // pointer FIRST: from the instant the bootstrap record exists,
      // readers must already resolve through the source
      CommitLog.writeCloneSource(fs, cloneDir, srcQ)
      if (defs.nonEmpty) Constraints.replicate(fs, cloneDir, defs)
      GeneratedColumns.replicate(fs, cloneDir, genDefs)
      // the clone reads the SOURCE's physical files through the
      // pointer chain — it needs the source's column map or a rename
      // would un-apply in the clone (maps evolve independently after)
      ColumnMapping.replicate(fs, cloneDir,
        ColumnMapping.rawLines(fs, sourceDir))
      val names = files.toSeq.sorted
      if (dv.isEmpty) CommitLog.commit(fs, cloneDir, -1L, names)
      else CommitLog.commitMutationCheckpoint(fs, cloneDir, -1L, names,
        dvNames = dv.toSeq.sorted)
      (files.size, dv.size)
    }
    }
  }

  /** Localize every source-resident byte the clone's committed view
    * references — after this the clone is a fully independent table
    * (the pointer is removed; source mutations/vacuum can no longer
    * break it). Byte-copy, not decode/re-encode: each file lands
    * under the clone with ITS OWN NAME via copy-to-hidden-tmp +
    * rename, so the committed view never changes and a crash at any
    * point leaves a clone that still resolves correctly (half-copied
    * tmp files are `.`-hidden — invisible to the name listings — and
    * swept by the next attempt). Bounded by the REMAINING
    * source-resident set: files the clone already rewrote locally are
    * skipped, so materialize after heavy churn copies only what the
    * churn did not already localize. Takes the clone's writer lock.
    * Returns (dataFilesCopied, dvFilesCopied); (0, 0) when `cloneDir`
    * is not a clone. */
  def materialize(spark: SparkSession, cloneDir: String): (Int, Int) = {
    val fs = new Path(cloneDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.cloneSourceOf(fs, cloneDir) match {
      case None => (0, 0)
      case Some(_) => CommitLog.withWriterLock(fs, cloneDir) {
        sweepTmp(fs, cloneDir)
        sweepTmp(fs, DeletionVectors.dvDir(cloneDir))
        // localize everything ANY live record references — not just
        // the current view — so the clone's time travel and restore
        // reach survives the source's retirement. A referenced name
        // resolvable nowhere (the source already reclaimed it) is
        // skipped: that version was unrestorable before materialize
        // and stays so, fail-fast at restore time as ever.
        val (files, dv) = CommitLog.liveReferencedNames(fs, cloneDir)
        val needData =
          (files -- CommitLog.dataFileNames(fs, cloneDir)).toSeq.sorted
        val copiedData = needData
          .zip(CommitLog.resolveDataPaths(fs, cloneDir, needData))
          .count { case (n, from) =>
            val src = new Path(from)
            fs.exists(src) && {
              copyAtomic(fs, src, new Path(cloneDir, n)); true
            }
          }
        val needDv =
          (dv -- DeletionVectors.dvFilesOnDisk(fs, cloneDir)).toSeq.sorted
        val copiedDv = needDv
          .zip(DeletionVectors.resolveDvPaths(fs, cloneDir, needDv))
          .count { case (n, from) =>
            val src = new Path(from)
            fs.exists(src) && {
              copyAtomic(fs, src,
                new Path(DeletionVectors.dvDir(cloneDir), n)); true
            }
          }
        // every resolvable referenced byte is local — retire the
        // pointer; the clone is a plain lake from here on
        fs.delete(CommitLog.cloneSourcePath(cloneDir), false)
        CommitLog.invalidateCloneSource(fs, cloneDir)
        (copiedData, copiedDv)
      }
    }
  }

  /** Crashed-materialize leftovers: `.tmp-` files are invisible to
    * every listing, so deleting them is always safe under the lock. */
  private def sweepTmp(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val d = new Path(dir)
    if (!fs.exists(d)) return
    fs.listStatus(d).iterator.map(_.getPath)
      .filter(_.getName.startsWith(".tmp-"))
      .foreach { p => fs.delete(p, false); () }
  }

  private def copyAtomic(fs: org.apache.hadoop.fs.FileSystem,
      from: Path, to: Path): Unit = {
    val tmp = new Path(to.getParent,
      s".tmp-${to.getName}-${java.util.UUID.randomUUID()}")
    fs.mkdirs(to.getParent)
    val in = fs.open(from)
    try {
      val out = fs.create(tmp, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      finally out.close()
    } finally in.close()
    require(fs.rename(tmp, to),
      s"materialize: could not publish ${to.getName}")
  }
}
