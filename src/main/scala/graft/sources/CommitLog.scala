package graft.sources

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** The on-disk commit-log format shared by
  * [[graft.streaming.LayoutSink]] (its writer) and [[ZOrder.optimize]]
  * (which must respect the log when it rewrites a sink-managed lake —
  * an OPTIMIZE that read the plain directory would bake a crashed
  * ingest attempt's uncommitted orphans in as committed data, and the
  * replay of that batch would then land its rows twice).
  *
  * Two record types under `lakeDir/_graft_log/`, both newline-separated
  * file-name lists published by write-then-atomic-rename:
  *
  *  - `<batchId>.manifest` — the data files that batch ADDED.
  *    Bootstrap manifest `-1` grandfathers files that predate the log.
  *  - `<N>.checkpoint` — a full SNAPSHOT of the committed file set
  *    covering every batch id ≤ N. [[checkpoint]] folds subsumed
  *    manifests (and any older checkpoint) into one and deletes them,
  *    so the log the sink lists and parses per batch stays O(batches
  *    since last checkpoint) instead of O(batches ever) — the same
  *    listing-cost bound Delta's `_last_checkpoint` provides.
  *
  * The committed view is `latest checkpoint ∪ manifests newer than
  * it`; batch-replay idempotence is [[isCommitted]] (manifest present
  * OR id ≤ checkpoint id) — a checkpoint must never make a replayed
  * batch look new, or its rows would land twice. Records are IMMUTABLE
  * once published (never rewritten in place) — the property the parse
  * cache below relies on. */
object CommitLog {

  def logDir(lakeDir: String): String = s"$lakeDir/_graft_log"

  /** Record entries carrying this prefix name DELETION-VECTOR sidecar
    * files (under `_dv/`) COVERED by the checkpoint — not data files.
    * Publishing them inside the same record as the data-file list is
    * what makes a merge-on-read mutation ATOMIC: one rename flips the
    * committed file set AND which vectors readers apply. A dv file on
    * disk that no live record covers is invisible crash debris (its
    * mutation never published), swept by the next DV writer. The
    * data-file readers below strip these entries; [[coveredDvNames]]
    * is their read surface. */
  private[sources] val DvPrefix = "dv:"

  private def isDvEntry(n: String): Boolean = n.startsWith(DvPrefix)

  /** PER-COMMIT DELTA entries, carried by mutation checkpoints since
    * r10: `add:<name>` = a data file this commit INTRODUCED (delta
    * files, rewrite outputs), `rm:<name>` = a data file it RETIRED
    * from the view. The full snapshot (the bare-name entries) remains
    * the committed view; the deltas make each mutation self-describing
    * — [[history]] reports per-version churn instead of only totals,
    * and a consumer diffing versions never has to re-derive what the
    * mutation knew at publish time. Strictly additive: every reader
    * below strips them via [[isDataEntry]]. */
  private[sources] val AddPrefix = "add:"
  private[sources] val RmPrefix = "rm:"

  /** A plain data-file name — not a dv-coverage or delta entry. */
  private[sources] def isDataEntry(n: String): Boolean =
    !isDvEntry(n) && !n.startsWith(AddPrefix) && !n.startsWith(RmPrefix)

  def manifestPath(lakeDir: String, batchId: Long): Path =
    new Path(logDir(lakeDir), s"$batchId.manifest")

  /** Checkpoints are GENERATION-versioned: `<id>.<gen>.checkpoint`.
    * Two writers publish at the same id legitimately — the sink's
    * fold and [[ZOrder.compactSmall]]'s file-swap both snapshot at
    * the current max batch id — and rename-over-existing is not
    * atomic (or not possible) on most filesystems, so "same id again"
    * must be a NEW name. Readers take the highest (id, gen); a
    * same-id re-publish with a fresh gen atomically wins.
    *
    * A DML mutation publishes `<id>.<gen>.mutation.checkpoint`
    * instead: row CONTENT changed in place at that id (unlike
    * OPTIMIZE/compaction, which reshape files but preserve every
    * row), so the history APIs must not serve that id as an immutable
    * snapshot — see [[committedNamesAt]]/[[changedNames]]. A FOLD
    * ([[checkpoint]]) that lands at a mutation id spells
    * `<id>.<gen>.fold.mutation.checkpoint`: unlike a DML mutation's
    * record (which sweeps nothing — the records below stay live and
    * every older version remains reconstructable), the fold DELETED
    * the records it subsumed, so the version-resolution guards must
    * treat it as truncating history. The parse helpers read all
    * spellings identically for the committed view. */
  def checkpointPath(lakeDir: String, id: Long, gen: Long,
      mutation: Boolean = false, fold: Boolean = false): Path =
    new Path(logDir(lakeDir),
      s"$id.$gen.${if (fold && mutation) "fold.mutation."
        else if (mutation) "mutation." else ""}checkpoint")

  private[sources] def isMutation(name: String): Boolean =
    name.contains(".mutation.")

  /** Does this checkpoint TRUNCATE the log below itself? Plain
    * checkpoints do (the fold sweeps subsumed records; OPTIMIZE seeds
    * a whole new log; compactSmall's swap physically retires names) —
    * and so does a fold that preserved the mutation marker. A DML
    * mutation checkpoint does NOT: it publishes a new version and
    * leaves every earlier record live, which is exactly what lets
    * time travel, restore and CLONE AS OF reach across it. */
  private[sources] def truncatesBelow(name: String): Boolean =
    !isMutation(name) || name.contains(".fold.")

  /** Flat `*.parquet` names under the lake (the sink writes flat;
    * `_`/`.` prefixes — the log itself, Spark markers — excluded). */
  def dataFileNames(fs: FileSystem, lakeDir: String): Set[String] = {
    val dir = new Path(lakeDir)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith(".")).toSet
  }

  /** Record parse cache, keyed by (path, length, modTime): published
    * records never change, so a hit is always valid (a same-named
    * record recreated after an OPTIMIZE swap gets a fresh
    * length/modTime and misses). Without this, every micro-batch
    * re-opens every record ever written — O(batches) opens per
    * batch, quadratic I/O over an ingest's life (thousands of
    * object-store GET round-trips per batch by batch 10k). With it,
    * per batch = one log-dir listing + opens for only records added
    * since the last batch; [[checkpoint]] bounds the listing itself. */
  private val recordCache =
    new ConcurrentHashMap[(String, Long, Long), Seq[String]]()

  private[sources] def readRecord(fs: FileSystem, m: FileStatus): Seq[String] = {
    val key = (m.getPath.toString, m.getLen, m.getModificationTime)
    var cached = recordCache.get(key)
    if (cached == null) {
      val in = fs.open(m.getPath)
      try {
        val bytes = new Array[Byte](m.getLen.toInt)
        in.readFully(0, bytes)
        cached = new String(bytes, UTF_8).split("\n").iterator
          .map(_.trim).filter(_.nonEmpty).toSeq
      } finally in.close()
      // every entry must be a BARE file name — readers join it under
      // lakeDir, so a separator or dot-segment in a (corrupt or
      // tampered) record would resolve OUTSIDE the lake. Reject the
      // record, not just the entry: a log that fails this is not a
      // log this code wrote.
      cached.find(n =>
          n.contains('/') || n.contains('\\') || n == "." || n == "..")
        .foreach(bad => throw new IllegalStateException(
          s"commit log record ${m.getPath.getName} holds a " +
            s"path-escaping entry '$bad' — corrupt or tampered log"))
      recordCache.put(key, cached)
    }
    cached
  }

  private[sources] def recordId(name: String): Long =
    name.substring(0, name.indexOf('.')).toLong

  /** (id, gen) of a checkpoint name; bare `<id>.checkpoint` = gen 0. */
  private[sources] def ckptKey(name: String): (Long, Long) = {
    val parts = name.split('.')
    (parts(0).toLong, if (parts.length >= 3) parts(1).toLong else 0L)
  }

  /** One listing of the log dir, split (checkpoints, manifests). */
  private[sources] def listLog(fs: FileSystem,
      lakeDir: String): (Seq[FileStatus], Seq[FileStatus]) = {
    val log = new Path(logDir(lakeDir))
    if (!fs.exists(log)) return (Seq.empty, Seq.empty)
    val all = fs.listStatus(log).toSeq
    (all.filter(_.getPath.getName.endsWith(".checkpoint")),
      all.filter(_.getPath.getName.endsWith(".manifest")))
  }

  /** Union of the newest checkpoint (if any) and every manifest newer
    * than it. Manifests the checkpoint subsumed may still be on disk
    * (a crash between checkpoint publish and cleanup) — their contents
    * are a subset of the checkpoint's, so including them is harmless,
    * but skipping them avoids reopening files the snapshot already
    * covers. A concurrent [[checkpoint]] may delete a manifest between
    * our listing and our read; the retry re-lists and sees the
    * checkpoint that replaced it. */
  def committedNames(fs: FileSystem, lakeDir: String): Set[String] =
    liveEntries(fs, lakeDir).filter(isDataEntry).toSet

  /** ONE retried resolution of the live view's raw record entries
    * (newest checkpoint ∪ newer manifests) — the shared base of
    * [[committedNames]], [[coveredDvNames]] and [[committedView]],
    * so the retry-on-concurrent-fold behavior is identical for all
    * three. */
  private def liveEntries(fs: FileSystem, lakeDir: String): Seq[String] = {
    var attempt = 0
    while (true) {
      try {
        val (ckpts, manifests) = listLog(fs, lakeDir)
        val ckpt = ckpts.sortBy(s => ckptKey(s.getPath.getName)).lastOption
        val ckptId = ckpt.map(s => ckptKey(s.getPath.getName)._1)
          .getOrElse(Long.MinValue)
        val base = ckpt.map(readRecord(fs, _)).getOrElse(Seq.empty)
        val newer = manifests
          .filter(s => recordId(s.getPath.getName) > ckptId)
          .flatMap(readRecord(fs, _))
        return base ++ newer
      } catch {
        case e: FileNotFoundException =>
          attempt += 1
          if (attempt >= 3) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The committed data files AND the covered deletion-vector sidecar
    * names, resolved from ONE log read — the lock-free MoR reader's
    * entry point. Resolving them separately can tear: a mutation
    * publishing between the two reads would pair version N's files
    * with version N+1's vectors (replaced rows vanish with no
    * replacement visible). One resolution makes the pair a consistent
    * snapshot of a single published version. */
  def committedView(fs: FileSystem,
      lakeDir: String): (Set[String], Set[String]) =
    splitView(liveEntries(fs, lakeDir))

  /** The raw record entries of the view AS PUBLISHED at the newest
    * version with id ≤ `asOf` — the ONE resolution every history verb
    * ([[committedNamesAt]], [[committedViewAt]], [[restore]]) builds
    * on, r10's versioned-log core. Mutation checkpoints are
    * TRANSPARENT: a DML verb's record never sweeps the records below
    * it, so every earlier version stays reconstructable — time travel,
    * restore and CLONE AS OF reach ACROSS mutations now, exactly as
    * Delta reconstructs any version from its per-commit log. Only a
    * checkpoint that [[truncatesBelow]] (a fold, an OPTIMIZE seed, a
    * compaction swap) ends the reach — FAIL FAST below it rather than
    * answer from a partial log; size `checkpointEvery` to the window
    * you need.
    *
    * Resolution rule (publish order is (id, manifest<checkpoint,
    * gen)): an exact checkpoint at `asOf` — any kind, highest
    * generation — IS the view as published; otherwise the newest
    * checkpoint below `asOf` plus the manifests between it and
    * `asOf`. Metadata-only: byte existence is the caller's check
    * ([[requireBytesRetained]]) — vacuum/OPTIMIZE retention may have
    * reclaimed an old version's bytes, which must fail loudly naming
    * them, never resolve to a partial read. */
  private def entriesAsPublishedAt(fs: FileSystem, lakeDir: String,
      asOf: Long, what: String): Seq[String] = {
    val (ckpts, manifests) = listLog(fs, lakeDir)
    val exact = ckpts.filter(s => ckptKey(s.getPath.getName)._1 == asOf)
    if (exact.nonEmpty)
      return readRecord(fs, exact.maxBy(s => ckptKey(s.getPath.getName)))
    require(!ckpts.exists(s => truncatesBelow(s.getPath.getName) &&
        ckptKey(s.getPath.getName)._1 > asOf),
      s"$what: a newer checkpoint folded the records this view needs — " +
        "history truncated (raise checkpointEvery to widen the window)")
    val base = ckpts.filter(s => ckptKey(s.getPath.getName)._1 < asOf)
      .sortBy(s => ckptKey(s.getPath.getName)).lastOption
    val baseId = base.map(s => ckptKey(s.getPath.getName)._1)
      .getOrElse(Long.MinValue)
    base.map(readRecord(fs, _)).getOrElse(Seq.empty) ++
      manifests.filter { s =>
        val id = recordId(s.getPath.getName)
        id > baseId && id <= asOf
      }.flatMap(readRecord(fs, _))
  }

  /** Every resolved name of an OLD version must still be on disk
    * (locally or through the clone-source chain) — vacuum/OPTIMIZE
    * retention reclaims rolled-past bytes, and a version whose bytes
    * are gone must fail LOUDLY naming them (the log cannot resurrect
    * bytes). One directory listing per dir, never per-file probes. */
  private def requireBytesRetained(fs: FileSystem, lakeDir: String,
      what: String, dataNames: Set[String], dvNames: Set[String]): Unit = {
    val onDisk = resolvableDataNames(fs, lakeDir)
    val missing = (dataNames -- onDisk).toSeq.sorted
    require(missing.isEmpty,
      s"$what: data file(s) reclaimed since — " +
        s"${missing.mkString(", ")} (vacuum/OPTIMIZE retention has " +
        "passed this version; the log cannot resurrect bytes)")
    if (dvNames.nonEmpty) {
      val dvDisk = DeletionVectors.resolvableDvNames(fs, lakeDir)
      val missDv = (dvNames -- dvDisk).toSeq.sorted
      require(missDv.isEmpty,
        s"$what: deletion-vector sidecar(s) reclaimed since — " +
          s"${missDv.mkString(", ")} (vacuum retention has passed " +
          "this version)")
    }
  }

  private def splitView(entries: Seq[String]): (Set[String], Set[String]) =
    (entries.filter(isDataEntry).toSet,
      entries.filter(isDvEntry).map(_.substring(DvPrefix.length)).toSet)

  /** TIME TRAVEL, pinned-reader contract: the committed file set a
    * reader pinned between batch `asOf` and `asOf + 1` saw — as a
    * BARE file list. Since r10 this resolves ACROSS later DML
    * mutations (their records sweep nothing); it still fails fast
    * when:
    *
    *  - a mutation sits EXACTLY at `asOf` — the id was rewritten in
    *    place, so "the view at asOf" is ambiguous between the pinner's
    *    pre-mutation snapshot and the post-mutation publish; address
    *    the version explicitly ([[committedViewAt]] serves the
    *    as-published view, [[history]] + [[viewOfVersion]] any exact
    *    record) or pin between appends;
    *  - the view carries covered deletion vectors — a bare list cannot
    *    express it; read it through `DeletionVectors.readMorAsOf`;
    *  - a truncating checkpoint folded past `asOf` (history gone), or
    *    retention reclaimed the version's bytes — both loud. */
  def committedNamesAt(fs: FileSystem, lakeDir: String,
      asOf: Long): Set[String] = {
    val what = s"time travel to batch $asOf"
    val (ckpts, _) = listLog(fs, lakeDir)
    require(!ckpts.exists(s => isMutation(s.getPath.getName) &&
        ckptKey(s.getPath.getName)._1 == asOf),
      s"$what: a DML mutation rewrote this id in place — the " +
        "pre-mutation snapshot and the post-mutation publish share " +
        "the id (rewritten history: read the as-published view via " +
        "committedViewAt / DeletionVectors.readMorAsOf, address an " +
        "exact record via viewOfVersion, or pin between appends)")
    val entries = entriesAsPublishedAt(fs, lakeDir, asOf, what)
    require(!entries.exists(isDvEntry),
      s"$what: the view at this id carries deletion " +
        "vectors — a bare file list cannot express it (read it " +
        "through DeletionVectors.readMorAsOf, or compact first to " +
        "materialize plain files)")
    val (data, _) = splitView(entries)
    requireBytesRetained(fs, lakeDir, what, data, Set.empty)
    data
  }

  /** TIME TRAVEL, as-published contract: the (data files, covered
    * deletion vectors) of the view AS PUBLISHED at the newest version
    * with id ≤ `asOf` — post-mutation when a mutation shares the id,
    * the same convention [[restore]] has always used. Unlike
    * [[committedNamesAt]] this serves DV-carrying versions (the pair
    * feeds `DeletionVectors.readMorAsOf` / `Clone.shallow(asOf)`),
    * so a lake's whole MoR history is readable, not just its plain
    * prefixes. Fails loudly past a truncating fold or when retention
    * reclaimed the version's bytes. */
  def committedViewAt(fs: FileSystem, lakeDir: String,
      asOf: Long): (Set[String], Set[String]) = {
    val what = s"time travel to batch $asOf"
    val (data, dv) =
      splitView(entriesAsPublishedAt(fs, lakeDir, asOf, what))
    requireBytesRetained(fs, lakeDir, what, data, dv)
    (data, dv)
  }

  /** The (data files, covered deletion vectors) of ONE exact version —
    * a [[VersionRecord]] from [[history]]. A checkpoint row (any kind)
    * serves its own snapshot, which is how the PRE-append /
    * POST-mutation views sharing a batch id are told apart; a manifest
    * row serves the forward reconstruction through it (its id's
    * pre-mutation view), sound only while no checkpoint at-or-above
    * its id truncates the records below. Byte retention checked as in
    * [[committedViewAt]]. */
  def viewOfVersion(fs: FileSystem, lakeDir: String,
      v: VersionRecord): (Set[String], Set[String]) = {
    val what = s"version (id ${v.id}, gen ${v.gen}, ${v.kind})"
    val (ckpts, manifests) = listLog(fs, lakeDir)
    val entries: Seq[String] =
      if (v.kind == "manifest") {
        require(!ckpts.exists(s => truncatesBelow(s.getPath.getName) &&
            ckptKey(s.getPath.getName)._1 >= v.id),
          s"$what: a checkpoint at-or-above this id folded the records " +
            "this view needs — history truncated")
        val base = ckpts.filter(s => ckptKey(s.getPath.getName)._1 < v.id)
          .sortBy(s => ckptKey(s.getPath.getName)).lastOption
        val baseId = base.map(s => ckptKey(s.getPath.getName)._1)
          .getOrElse(Long.MinValue)
        base.map(readRecord(fs, _)).getOrElse(Seq.empty) ++
          manifests.filter { s =>
            val id = recordId(s.getPath.getName)
            id > baseId && id <= v.id
          }.flatMap(readRecord(fs, _))
      } else {
        val rec = ckpts.find(s =>
          ckptKey(s.getPath.getName) == ((v.id, v.gen)))
        require(rec.nonEmpty, s"$what: no live checkpoint record — " +
          "a fold swept it (history truncated)")
        readRecord(fs, rec.get)
      }
    val (data, dv) = splitView(entries)
    requireBytesRetained(fs, lakeDir, what, data, dv)
    (data, dv)
  }

  /** The deletion-vector sidecar files the CURRENT committed view
    * covers — the `dv:` entries of the newest checkpoint plus any
    * newer manifests (appends never carry them, but the union is the
    * same resolution rule as [[committedNames]]). Only these vectors
    * are VISIBLE: a `_dv` file not in this set is an unpublished
    * mutation's debris. Empty on a log-less lake. */
  def coveredDvNames(fs: FileSystem, lakeDir: String): Set[String] =
    committedView(fs, lakeDir)._2

  /** CDC-style incremental view: the file names batches in
    * `(fromExclusive, toInclusive]` ADDED — what a downstream
    * incremental consumer (index refresh, feature backfill, training
    * shard picker) must process after having consumed up to
    * `fromExclusive`. Data files are add-only in manifests (rewrites
    * go through [[commitCheckpoint]], which truncates history), so
    * the added files ARE the delta. Sound only while every needed
    * manifest is live: a checkpoint with id > `fromExclusive` folded
    * per-batch attribution away — FAIL FAST then, same horizon
    * contract as [[committedNamesAt]]. */
  def changedNames(fs: FileSystem, lakeDir: String, fromExclusive: Long,
      toInclusive: Long): Set[String] = {
    require(fromExclusive <= toInclusive,
      s"changedNames: empty range ($fromExclusive, $toInclusive]")
    val (ckpts, manifests) = listLog(fs, lakeDir)
    // a DML mutation at id >= the cursor rewrote rows the consumer may
    // already have taken pre-mutation — an add-only file delta cannot
    // express that, so fail fast (>=, not >: a cursor AT the mutation
    // id cannot prove it synced after the mutation). Checked FIRST so
    // the diagnosis names the real cause when both guards apply.
    // Resync contract: full-read, then resume from the next APPENDED
    // batch — appends land manifests above the mutation id, and a
    // later fold clears the marker behind the generic truncation
    // guard below.
    require(!ckpts.exists(s => isMutation(s.getPath.getName) &&
        ckptKey(s.getPath.getName)._1 >= fromExclusive),
      s"changes after batch $fromExclusive: a DML mutation rewrote " +
        "rows at-or-after this cursor — the delta is not expressible " +
        "as added files (resync with a full read, then resume from " +
        "the next appended batch)")
    require(!ckpts.exists(s => ckptKey(s.getPath.getName)._1 > fromExclusive),
      s"changes after batch $fromExclusive: a checkpoint folded " +
        "per-batch attribution away — history truncated (raise " +
        "checkpointEvery to widen the change-tracking window)")
    manifests.filter { s =>
      val id = recordId(s.getPath.getName)
      id > fromExclusive && id <= toInclusive
    }.flatMap(readRecord(fs, _)).filter(isDataEntry).toSet
  }

  /** Lake maintenance: delete files that are NOT in the committed
    * view — crashed-ingest leftovers in the data directory, plus
    * `_dv/` deletion-vector sidecars the log no longer covers (a
    * crashed MoR mutation's debris, or coverage dropped by
    * [[DeletionVectors.compact]] / [[restore]]) — but only when older
    * than `olderThanMs` (an IN-FLIGHT writer's files have fresh
    * modtimes and survive; pass 0 only when no writer can be
    * mid-batch, e.g. the sink's own between-batch cleanup, which runs
    * under the writer lock mutations also take). Never touches the
    * log, a committed file, or a covered sidecar, so present reads,
    * replays and AS-OF reads are all unaffected — an orphan was never
    * committed at any id, and an uncovered sidecar is invisible to
    * every reader by the coverage contract. After a [[restore]], the
    * rolled-back batches' files age into this sweep — the retention
    * window IS `olderThanMs`, exactly Delta's VACUUM contract. No-ops
    * on a log-less lake (every file is data there, none provably
    * orphaned). Returns the deleted names, sidecars as `_dv/<name>`. */
  def vacuum(fs: FileSystem, lakeDir: String,
      olderThanMs: Long = 3600000L): Seq[String] = {
    if (!fs.exists(new Path(logDir(lakeDir)))) return Seq.empty
    val horizon = System.currentTimeMillis() - olderThanMs
    def aged(p: Path): Boolean =
      // a racing writer may commit-or-remove between list and stat
      try fs.getFileStatus(p).getModificationTime <= horizon
      catch { case _: FileNotFoundException => false }
    val committed = committedNames(fs, lakeDir)
    val swept = (dataFileNames(fs, lakeDir) -- committed).toSeq.sorted
      .filter(n => aged(new Path(lakeDir, n)))
    swept.foreach { n => fs.delete(new Path(lakeDir, n), false); () }
    val dvd = new Path(DeletionVectors.dvDir(lakeDir))
    val dvSwept =
      if (!fs.exists(dvd)) Seq.empty
      else {
        val covered = coveredDvNames(fs, lakeDir)
        fs.listStatus(dvd).iterator.map(_.getPath.getName)
          .filter(n => n.endsWith(".parquet") && !covered(n))
          .filter(n => aged(new Path(dvd, n))).toSeq.sorted
      }
    dvSwept.foreach { n => fs.delete(new Path(dvd, n), false); () }
    // change-feed directories with NO live checkpoint at their
    // (id, gen) key are unreadable by contract — a crashed mutation's
    // debris (aged past the horizon, same in-flight protection as
    // data files: the pre-publish write is fresh) or a version a
    // truncating fold already swept. Live keys' directories are the
    // feed itself and are never touched here.
    val cdfRoot = new Path(ChangeDataFeed.cdfRoot(lakeDir).toString)
    val cdfSwept =
      if (!fs.exists(cdfRoot)) Seq.empty
      else {
        val live = listLog(fs, lakeDir)._1
          .map(s => ckptKey(s.getPath.getName))
          .map { case (i, g) => s"$i.$g" }.toSet
        fs.listStatus(cdfRoot).toSeq
          .filter(d => !live(d.getPath.getName) && aged(d.getPath))
          .map(_.getPath.getName).sorted
      }
    cdfSwept.foreach { n => fs.delete(new Path(cdfRoot, n), true); () }
    swept ++ dvSwept.map(n => s"_dv/$n") ++ cdfSwept.map(n => s"_cdf/$n")
  }

  /** TIMESTAMP AS OF — Delta's time-travel-by-wall-clock beside the
    * id-addressed [[committedViewAt]]: the version served is the
    * NEWEST one published at-or-before `tsMs` (publish order, record
    * modification times — the same clock [[retention]] expires by).
    * Fails loudly when `tsMs` predates the first live record (either
    * genuinely before the lake existed, or the history below was
    * expired/folded — the caller cannot tell the difference and must
    * not get an empty view for it). Resolution and byte-retention
    * guards are [[viewOfVersion]]'s. Returns ((files, dv), the
    * record's (id, modifiedMs)) so callers can report what they
    * resolved to. */
  def committedViewAtTime(fs: FileSystem, lakeDir: String,
      tsMs: Long): ((Set[String], Set[String]), (Long, Long)) = {
    val recs = history(fs, lakeDir)
    require(recs.nonEmpty,
      s"time travel to $tsMs: $lakeDir has no commit log records")
    val at = recs.filter(_.modifiedMs <= tsMs)
    require(at.nonEmpty,
      s"time travel to $tsMs: before the first live record " +
        s"(oldest = ${recs.map(_.modifiedMs).min}) — either the lake " +
        "did not exist yet or that history was expired/folded")
    // true publish order: (id, manifest < checkpoint, gen) — history()
    // sorts kinds lexicographically, which misorders a same-(id, gen)
    // restore checkpoint against its manifest
    val v = at.sortBy(r =>
      (r.id, if (r.kind == "manifest") 0 else 1, r.gen)).last
    (viewOfVersion(fs, lakeDir, v), (v.id, v.modifiedMs))
  }

  /** AGE-BASED RETENTION — the operational policy beside the
    * id-horizon tools ([[vacuum]] is an orphan sweep, [[checkpoint]]
    * a full fold): expire every version SUPERSEDED before
    * `nowMs - olderThanMs`, keeping newer time travel intact. A
    * version is expired when its SUCCESSOR was already published at
    * the cutoff (Delta's reading: the version had stopped being
    * current by then); the current version never expires. The
    * boundary is then rolled back to a strict id boundary (a fold
    * cannot split same-id generations) and the pass:
    *
    *  1. publishes ONE truncating fold holding the boundary version's
    *     as-published view (data files AND covered vectors — dropping
    *     them would resurrect MoR-deleted rows), spelled
    *     `.fold.mutation.` when a DML record lives at that id, so the
    *     version-resolution guards keep failing fast exactly as
    *     [[checkpoint]]'s fold does;
    *  2. deletes every record at-or-below the boundary id (the fold
    *     subsumes them) — those versions become unreachable, loudly:
    *     travel below the fold reports "history truncated";
    *  3. sweeps data/sidecar files no SURVIVING record references,
    *     aged past `graceMs` (the same crash-window grace every sweep
    *     here uses) — the expired versions' exclusive bytes. Bytes
    *     shared with live versions are never touched.
    *
    * Metadata-scale: one log listing + one read per live record; the
    * byte sweep stats only unreferenced names. Runs under the writer
    * lock. `nowMs` is injectable for deterministic tests/backdating.
    * Returns (records expired, file names reclaimed). */
  def retention(fs: FileSystem, lakeDir: String, olderThanMs: Long,
      graceMs: Long = 3600000L,
      nowMs: Long = System.currentTimeMillis()): (Int, Seq[String]) = {
    require(olderThanMs >= 0, "retention: olderThanMs must be >= 0")
    if (!fs.exists(new Path(logDir(lakeDir)))) return (0, Seq.empty)
    withWriterLock(fs, lakeDir) {
      val cutoff = nowMs - olderThanMs
      val (ckpts, manifests) = listLog(fs, lakeDir)
      // publish order: (id, manifest < checkpoint, gen)
      val ordered: Seq[(FileStatus, Long, Long, Boolean)] =
        (manifests.map(s => (s, recordId(s.getPath.getName), 0L, false))
          ++ ckpts.map { s =>
            val (id, gen) = ckptKey(s.getPath.getName)
            (s, id, gen, true)
          }).sortBy { case (_, id, gen, isCkpt) => (id, isCkpt, gen) }
      if (ordered.size <= 1) return (0, Seq.empty)
      // expired = superseded before the cutoff (successor's modtime)
      var expired = 0
      while (expired + 1 < ordered.size &&
          ordered(expired + 1)._1.getModificationTime <= cutoff)
        expired += 1
      // roll back to a strict id boundary: the fold outranks every
      // same-id generation, so the first SURVIVOR must sit at a
      // strictly greater id than the boundary record
      while (expired > 0 &&
          ordered(expired)._2 == ordered(expired - 1)._2)
        expired -= 1
      if (expired == 0) return (0, Seq.empty)
      val (pivotSt, pivotId, pivotGen, pivotIsCkpt) = ordered(expired - 1)
      // CONVERGENCE: the boundary version stays behind as the fold's
      // base (Delta keeps the retention-boundary checkpoint too), so
      // a previous pass's base re-qualifies as "superseded" forever —
      // when the would-be pivot IS already a truncating base with
      // nothing beneath it, there is nothing left to expire
      if (pivotIsCkpt && truncatesBelow(pivotSt.getPath.getName) &&
          !ordered.take(expired - 1).exists(_._2 <= pivotId))
        return (0, Seq.empty)
      // the boundary version's exact as-published view
      val kind =
        if (!pivotIsCkpt) "manifest"
        else if (isMutation(pivotSt.getPath.getName)) "mutation"
        else "checkpoint"
      val (data, dv) = viewOfVersion(fs, lakeDir,
        VersionRecord(pivotId, pivotGen, kind, 0, 0, 0L,
          current = false, reachable = true))
      val foldGen = ckpts.map(s => ckptKey(s.getPath.getName)._2)
        .foldLeft(-1L)(math.max) + 1L
      val mutAt = ckpts.exists(s => isMutation(s.getPath.getName) &&
        ckptKey(s.getPath.getName)._1 == pivotId) || kind == "mutation"
      writeAtomic(fs, lakeDir,
        checkpointPath(lakeDir, pivotId, foldGen, mutation = mutAt,
          fold = mutAt),
        data.toSeq.sorted ++ dv.toSeq.sorted.map(DvPrefix + _))
      // subsumed: every record at-or-below the boundary id, except
      // the fold just published
      val foldName = checkpointPath(lakeDir, pivotId, foldGen,
        mutation = mutAt, fold = mutAt).getName
      (ckpts ++ manifests).foreach { s =>
        val n = s.getPath.getName
        if (recordId(n) <= pivotId && n != foldName) {
          fs.delete(s.getPath, false); ()
        }
      }
      // reclaim the expired versions' EXCLUSIVE bytes: anything no
      // surviving record references, past the crash-window grace
      val (ckpts2, manifests2) = listLog(fs, lakeDir)
      val liveEntriesAll = (ckpts2 ++ manifests2)
        .flatMap(readRecord(fs, _)).toSet
      val liveData = liveEntriesAll.filter(isDataEntry) ++
        liveEntriesAll.collect {
          case e if e.startsWith(AddPrefix) => e.substring(AddPrefix.length)
          case e if e.startsWith(RmPrefix) => e.substring(RmPrefix.length)
        }
      val liveDv = liveEntriesAll.collect {
        case e if isDvEntry(e) => e.substring(DvPrefix.length)
      }
      def aged(p: Path): Boolean =
        try nowMs - fs.getFileStatus(p).getModificationTime >= graceMs
        catch { case _: FileNotFoundException => false }
      val sweptData = (dataFileNames(fs, lakeDir) -- liveData)
        .toSeq.sorted.filter(n => aged(new Path(lakeDir, n)))
      sweptData.foreach { n => fs.delete(new Path(lakeDir, n), false); () }
      val dvd = new Path(DeletionVectors.dvDir(lakeDir))
      val sweptDv =
        if (!fs.exists(dvd)) Seq.empty[String]
        else fs.listStatus(dvd).iterator.map(_.getPath.getName)
          .filter(n => n.endsWith(".parquet") && !liveDv(n))
          .filter(n => aged(new Path(dvd, n))).toSeq.sorted
      sweptDv.foreach { n => fs.delete(new Path(dvd, n), false); () }
      (expired, sweptData ++ sweptDv.map(n => s"_dv/$n"))
    }
  }

  /** RESTORE (rollback): republish the committed view AS OF
    * `toBatchId` as the table's NEW current version — ONE
    * metadata-scale checkpoint write, ZERO data I/O, so rolling a
    * 100 TB lake back from a bad ingest batch costs milliseconds, not
    * a re-ingest. Publishes AT the current max id (a new generation)
    * — the same convention as every DML verb, and not an accident: a
    * checkpoint minted at `maxId + 1` would collide with the next id
    * an independently-counting writer (a streaming sink's epoch)
    * commits, and that batch's manifest would be silently subsumed —
    * invisible data. Appends after the restore land at `maxId + 1`
    * and above, exactly as they would have. Returns the id restored
    * AT. Crash-safe and replayable: a repeat targeting the restored
    * content republishes the identical view at a fresh generation.
    *
    * Resolution reaches exactly as far as time travel does:
    *
    *  - a checkpoint EXACTLY at `toBatchId` (any kind — unlike
    *    [[committedNamesAt]], a MUTATION checkpoint is fine here:
    *    restore targets the view AS PUBLISHED at that id, not the
    *    pre-mutation snapshot a pinned reader saw) → that record IS
    *    the restored view, INCLUDING its covered deletion vectors —
    *    coverage travels with the rollback;
    *  - otherwise, no checkpoint newer than `toBatchId` may exist
    *    (a fold may have subsumed-and-deleted manifests the view
    *    needs — FAIL FAST; size `checkpointEvery` for the rollback
    *    window you need) and the view is the newest checkpoint ≤
    *    `toBatchId` plus the manifests in between.
    *
    * Every restored data file and sidecar must still be ON DISK —
    * [[vacuum]] or an OPTIMIZE may have reclaimed rolled-past
    * versions' files — else FAIL FAST naming the missing ones (the
    * log alone cannot resurrect bytes). Publishes a MUTATION
    * checkpoint: rows visible after `toBatchId` disappear from the
    * view, so CDC cursors ([[changedNames]],
    * [[DeletionVectors.readMorChanges]]) and as-of pinners must
    * fail fast and resync rather than silently miss the rollback.
    * Files newer than the restored view become uncommitted orphans
    * that age into [[vacuum]]'s sweep — restore then vacuum is the
    * full Delta-style RESTORE + retention story. Takes the writer
    * lock: a restore racing a mutation would fork the version
    * history. */
  def restore(fs: FileSystem, lakeDir: String, toBatchId: Long): Long =
    withWriterLock(fs, lakeDir) {
      val maxId = maxCommittedId(fs, lakeDir)
      require(maxId != Long.MinValue, s"restore: $lakeDir has no log")
      require(toBatchId <= maxId,
        s"restore to batch $toBatchId: the log only reaches id $maxId")
      // the shared versioned-log resolution: exact records (any kind)
      // serve as published; otherwise forward reconstruction through
      // any DML mutations in between (their records sweep nothing) —
      // a restore now reaches PRE-mutation versions too, as long as a
      // truncating fold has not passed them. Byte-existence checked
      // with ONE directory listing per dir (resolution-aware: a
      // shallow clone's names live in its source dir).
      val entries = entriesAsPublishedAt(fs, lakeDir, toBatchId,
        s"restore to batch $toBatchId")
      val (data, dv) = splitView(entries)
      requireBytesRetained(fs, lakeDir, s"restore to batch $toBatchId",
        data, dv)
      // per-commit delta entries: what this rollback adds back and
      // retires relative to the CURRENT view, so history() reads the
      // restore's churn directly
      val (curData, _) = committedView(fs, lakeDir)
      commitMutationCheckpoint(fs, lakeDir, maxId,
        data.toSeq.sorted, dv.toSeq.sorted,
        added = (data -- curData).toSeq.sorted,
        removed = (curData -- data).toSeq.sorted)
      maxId
    }

  /** One row of [[history]]: a live log record. `kind` is
    * `manifest` (a batch's added files), `checkpoint` (a full
    * snapshot) or `mutation` (a snapshot that changed row content in
    * place). `current` marks the records whose union IS the committed
    * view; `reachable` marks versions [[viewOfVersion]] (and so time
    * travel / [[restore]]) can still resolve — since r10's versioned
    * log that is EVERY live checkpoint record (DML mutations included;
    * even out-ranked same-id generations address exactly), and every
    * manifest no truncating fold has passed. `addedFiles` /
    * `removedFiles` are the per-commit delta a mutation record carries
    * (`add:`/`rm:` entries; a manifest's adds are its whole list). */
  final case class VersionRecord(id: Long, gen: Long, kind: String,
      dataFiles: Int, dvFiles: Int, modifiedMs: Long,
      current: Boolean, reachable: Boolean,
      addedFiles: Int = 0, removedFiles: Int = 0)

  /** DESCRIBE HISTORY: the live log records, oldest first — the
    * observability surface for time travel, CDC cursors and
    * [[restore]] ("which version can I still roll back to, and what
    * does it hold?"). One log listing + one read per live record —
    * O(records since the last fold), the same bound every log op has;
    * never touches data. Subsumed records a fold already swept are
    * gone — their ids show as unreachable exactly as the travel APIs
    * treat them. */
  def history(fs: FileSystem, lakeDir: String): Seq[VersionRecord] = {
    val (ckpts, manifests) = listLog(fs, lakeDir)
    val ckptMax = ckpts.map(s => ckptKey(s.getPath.getName)._1)
      .foldLeft(Long.MinValue)(math.max)
    val truncMax = ckpts.filter(s => truncatesBelow(s.getPath.getName))
      .map(s => ckptKey(s.getPath.getName)._1)
      .foldLeft(Long.MinValue)(math.max)
    val winner = ckpts.sortBy(s => ckptKey(s.getPath.getName))
      .lastOption.map(_.getPath.getName)
    def row(s: FileStatus, id: Long, gen: Long, kind: String,
        current: Boolean, reachable: Boolean): VersionRecord = {
      val rec = readRecord(fs, s)
      val (dv, rest) = rec.partition(isDvEntry)
      VersionRecord(id, gen, kind, rest.count(isDataEntry), dv.size,
        s.getModificationTime, current, reachable,
        addedFiles = rest.count(_.startsWith(AddPrefix)),
        removedFiles = rest.count(_.startsWith(RmPrefix)))
    }
    val c = ckpts.map { s =>
      val (id, gen) = ckptKey(s.getPath.getName)
      val mut = isMutation(s.getPath.getName)
      row(s, id, gen, if (mut) "mutation" else "checkpoint",
        current = winner.contains(s.getPath.getName),
        // a live checkpoint record always addresses exactly through
        // viewOfVersion — mutations and out-ranked generations too
        reachable = true)
    }
    val m = manifests.map { s =>
      val id = recordId(s.getPath.getName)
      row(s, id, 0L, "manifest",
        current = id > ckptMax,
        // DML mutations above are transparent to reconstruction; only
        // a truncating fold AT-OR-ABOVE ends a manifest's reach —
        // strictly-above here, matching [[viewOfVersion]]'s refusal
        // (`>= v.id`) exactly, so history never reports reachable a
        // version the travel API then rejects (the id == truncMax
        // boundary the normal compactSmall flow produces)
        reachable = id > truncMax)
    }
    (c ++ m).sortBy(r => (r.id, r.gen, r.kind))
  }

  /** EPOCH-OWNER marker (under the log dir): present when an
    * epoch-replaying streaming sink ([[graft.streaming.LayoutSink]])
    * owns this lake's manifest-id space. The sink's restart-replay
    * idempotence reads "id ≤ a committed id" as "already done"
    * ([[isCommitted]]), so a foreign writer claiming ids ABOVE the
    * sink's next epoch ([[graft.sources.Occ.append]]'s max+1) would
    * make the sink silently skip a whole epoch's rows — silent data
    * loss. The marker turns that documented one-lake-one-id-discipline
    * contract into a runtime gate: the sink publishes it inside its
    * first commit section, and `Occ.append` REFUSES an epoch-owned
    * lake (DML verbs are unaffected — they publish AT the max, never
    * claiming a new id). Never a log record (no `.manifest`/
    * `.checkpoint` suffix); content names the claimant for the
    * refusal diagnostic. */
  private val EpochOwnerName = "_epoch_owner"

  private def epochOwnerPath(lakeDir: String): Path =
    new Path(logDir(lakeDir), EpochOwnerName)

  /** Claim the lake's id space for an epoch-replaying sink —
    * idempotent (first claim wins; re-claims by the same or a
    * restarted sink are no-ops). Callers hold the writer lock. */
  def claimEpochOwner(fs: FileSystem, lakeDir: String,
      owner: String): Unit = {
    val p = epochOwnerPath(lakeDir)
    if (fs.exists(p)) return
    fs.mkdirs(new Path(logDir(lakeDir)))
    val out =
      try fs.create(p, /* overwrite = */ false)
      catch { case _: java.io.IOException => return } // raced: claimed
    try out.write(owner.getBytes(UTF_8)) finally out.close()
  }

  /** The epoch sink owning this lake's id space, if one claimed it. */
  def epochOwner(fs: FileSystem, lakeDir: String): Option[String] = {
    val p = epochOwnerPath(lakeDir)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
    finally in.close()
  }

  /** SHALLOW-CLONE pointer file name (under the log dir): when
    * present, committed names not physically under this lake resolve
    * against the recorded source lake — see [[Clone]] for the
    * contract. The pointer is written once at clone time and removed
    * by [[Clone.materialize]]; it is never a log record (listings
    * filter on the `.manifest`/`.checkpoint` suffixes). */
  private val CloneSourceName = "_clone_source"

  private[sources] def cloneSourcePath(lakeDir: String): Path =
    new Path(logDir(lakeDir), CloneSourceName)

  /** Positive-only cache: a pointer, once written, never changes its
    * content (materialize DELETES it — [[Clone.materialize]]
    * invalidates the entry). Negative results are never cached, so a
    * dir that BECOMES a clone (fresh [[Clone.shallow]] target) is
    * seen on the next call. */
  private val cloneSourceCache = new ConcurrentHashMap[String, String]()

  /** Cache keys are the QUALIFIED pointer path: callers reach the
    * same clone under different spellings (relative, absolute,
    * scheme-qualified — the chain itself stores qualified paths), and
    * a spelling-keyed cache would leave stale positive entries behind
    * a [[Clone.materialize]] that invalidated only its own
    * spelling. */
  private def cloneKey(fs: FileSystem, lakeDir: String): String =
    fs.makeQualified(cloneSourcePath(lakeDir)).toString

  private[sources] def invalidateCloneSource(fs: FileSystem,
      lakeDir: String): Unit = {
    cloneSourceCache.remove(cloneKey(fs, lakeDir)); ()
  }

  /** The source lake this lake shallow-clones, if any. One existence
    * probe on EVERY path — non-clone fast path and cache hit alike
    * (every caller is already doing a log listing, so this never
    * changes a read's I/O class). The hit-side probe is what keeps the
    * positive cache honest when the pointer disappears OUTSIDE
    * [[Clone.materialize]]'s explicit invalidation — an OPTIMIZE dir
    * swap or an external delete — otherwise a stale hit would report
    * a retired source chain for the JVM's lifetime. */
  def cloneSourceOf(fs: FileSystem, lakeDir: String): Option[String] = {
    val p = cloneSourcePath(lakeDir)
    val key = cloneKey(fs, lakeDir)
    val hit = cloneSourceCache.get(key)
    if (hit != null) {
      if (fs.exists(p)) return Some(hit)
      cloneSourceCache.remove(key)
      return None
    }
    val st =
      try fs.getFileStatus(p)
      catch { case _: FileNotFoundException => return None }
    val in = fs.open(p)
    val src =
      try {
        val bytes = new Array[Byte](st.getLen.toInt)
        in.readFully(0, bytes)
        new String(bytes, UTF_8).trim
      } finally in.close()
    require(src.nonEmpty,
      s"corrupt clone pointer ${p} — empty source path")
    cloneSourceCache.put(key, src)
    Some(src)
  }

  /** Every data-file name and sidecar name referenced by ANY live log
    * record (current view, older manifests, out-ranked generations) —
    * the universe [[Clone.materialize]] must localize so the clone's
    * TIME TRAVEL and RESTORE reach survives the source's retirement,
    * not just its current view. Bounded by the live log (a fold
    * truncates it, exactly as it truncates travel). */
  private[sources] def liveReferencedNames(fs: FileSystem,
      lakeDir: String): (Set[String], Set[String]) = {
    val (ckpts, manifests) = listLog(fs, lakeDir)
    val entries = (ckpts ++ manifests).flatMap(readRecord(fs, _))
    // delta entries (`add:`/`rm:`) REFERENCE data files too — a
    // mutation's retired files belong to the versions below it, and
    // materialize must localize them for the clone's travel reach
    val data = entries.filterNot(isDvEntry).map { n =>
      if (n.startsWith(AddPrefix)) n.substring(AddPrefix.length)
      else if (n.startsWith(RmPrefix)) n.substring(RmPrefix.length)
      else n
    }.toSet
    (data,
      entries.filter(isDvEntry).map(_.substring(DvPrefix.length)).toSet)
  }

  /** Resolve committed NAMES to physical paths. On a plain lake this
    * is exactly the historical `s"$lakeDir/$name"` join (zero extra
    * I/O beyond one pointer probe). On a SHALLOW CLONE, a name
    * physically present under the clone wins (fresh writes, rewrites,
    * materialized copies); anything else resolves through the source
    * chain — so every read verb serves the clone's committed view
    * without the clone holding those bytes. Order-preserving: output
    * path i is input name i's resolution. A name resolvable nowhere
    * maps to the CHAIN BASE's path, so the eventual read fails
    * loudly there (naming the lake that should have held it) instead
    * of silently dropping files. */
  def resolveDataPaths(fs: FileSystem, lakeDir: String,
      names: Seq[String]): Seq[String] =
    cloneSourceOf(fs, lakeDir) match {
      case None => names.map(n => s"$lakeDir/$n")
      case Some(src) =>
        val local = dataFileNames(fs, lakeDir)
        val missing = names.filterNot(local)
        val there = missing.zip(resolveDataPaths(fs, src, missing)).toMap
        names.map(n => if (local(n)) s"$lakeDir/$n" else there(n))
    }

  /** A clone pointer with ZERO committed records is a crashed
    * half-clone ([[Clone.shallow]] died between the pointer write and
    * the bootstrap publish): serving it as an empty table would
    * silently hand a consumer 0 rows for what was meant to be a
    * populated branch. Every committed-read surface calls this before
    * falling back to an empty/plain-directory answer; re-running
    * Clone.shallow self-heals the target. */
  private[graft] def requireNotHalfClone(fs: FileSystem,
      lakeDir: String, what: String): Unit =
    require(cloneSourceOf(fs, lakeDir).isEmpty ||
        recordCount(fs, lakeDir) > 0,
      s"$what: $lakeDir is a half-created clone (source pointer " +
        "present, no committed records) — re-run Clone.shallow")

  /** [[resolveDataPaths]] for call sites that carry a session, not a
    * FileSystem (the mutation-verb planning closures). */
  def resolveDataPaths(spark: org.apache.spark.sql.SparkSession,
      lakeDir: String, names: Seq[String]): Seq[String] =
    resolveDataPaths(new Path(lakeDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      lakeDir, names)

  /** Every data-file name resolvable from this lake: physically local
    * ∪ the source chain's — the existence universe [[restore]] checks
    * reclaimed bytes against (a clone's committed names live in the
    * source dir, and a local listing alone would misreport them as
    * vacuumed). */
  def resolvableDataNames(fs: FileSystem, lakeDir: String): Set[String] =
    cloneSourceOf(fs, lakeDir) match {
      case None => dataFileNames(fs, lakeDir)
      case Some(src) =>
        dataFileNames(fs, lakeDir) ++ resolvableDataNames(fs, src)
    }

  /** Highest batch id the log covers: max over manifest ids and
    * checkpoint ids (a checkpoint at N covers every id ≤ N).
    * Long.MinValue when the log is empty. */
  def maxCommittedId(fs: FileSystem, lakeDir: String): Long = {
    val (ckpts, manifests) = listLog(fs, lakeDir)
    val ids = (ckpts ++ manifests).map(s => recordId(s.getPath.getName))
    if (ids.isEmpty) Long.MinValue else ids.max
  }

  /** Replay idempotence: has `batchId` already committed? True when
    * its manifest is on disk OR a checkpoint at id ≥ batchId subsumed
    * it (the manifest itself may have been cleaned up). */
  def isCommitted(fs: FileSystem, lakeDir: String, batchId: Long): Boolean = {
    if (fs.exists(manifestPath(lakeDir, batchId))) return true
    val (ckpts, _) = listLog(fs, lakeDir)
    ckpts.exists(s => recordId(s.getPath.getName) >= batchId)
  }

  /** Number of live records in the log — the sink's trigger for
    * [[checkpoint]] (listing and union cost grow with this). */
  def recordCount(fs: FileSystem, lakeDir: String): Int = {
    val (ckpts, manifests) = listLog(fs, lakeDir)
    ckpts.size + manifests.size
  }

  /** Fold the log into one snapshot: write `<N>.checkpoint` (N = the
    * highest id on disk) holding the full committed set, then delete
    * the records it subsumes. Crash-safe at every boundary: before the
    * rename nothing changed; after it, stale subsumed records are
    * redundant subsets that the next checkpoint's cleanup sweeps.
    * Single-writer (the sink calls it between batches); concurrent
    * READERS are safe — see [[committedNames]]'s retry. No-ops on an
    * empty or already-folded log. */
  def checkpoint(fs: FileSystem, lakeDir: String): Unit = {
    val (ckpts, manifests) = listLog(fs, lakeDir)
    if (ckpts.size + manifests.size <= 1) return // nothing to fold
    val n = (ckpts ++ manifests).map(s => recordId(s.getPath.getName)).max
    val latest = ckpts.sortBy(s => ckptKey(s.getPath.getName)).lastOption
    val snapshotName =
      latest match {
        case Some(s) if ckptKey(s.getPath.getName)._1 == n &&
            truncatesBelow(s.getPath.getName) =>
          // the newest snapshot already covers the max id AND already
          // reads as truncating (a plain checkpoint or an earlier
          // fold) — no new write needed, just sweep below. A plain
          // `.mutation.` record must NOT take this arm: sweeping under
          // it would leave a record the version resolution reads as
          // TRANSPARENT over records that no longer exist — silent
          // empty views below; the write branch republishes it with
          // the `.fold.mutation.` spelling first.
          s.getPath.getName
        case _ =>
          // the fold must CARRY the covered-dv entries forward: a
          // snapshot that dropped them would uncover live vectors and
          // silently resurrect MoR-deleted rows on the next read
          val files = committedNames(fs, lakeDir).toSeq.sorted ++
            coveredDvNames(fs, lakeDir).toSeq.sorted.map(DvPrefix + _)
          val gen = latest
            .map(s => ckptKey(s.getPath.getName)._2 + 1).getOrElse(0L)
          // folding PRESERVES the mutation marker at the fold id: the
          // in-place rewrite happened whether or not its record
          // survives, so pinners at this id must keep failing fast.
          // Spelled `.fold.mutation.` — unlike a live DML record the
          // fold DELETES the records below (the sweep right after), so
          // version resolution must read it as truncating, not
          // transparent
          val mutAtN = ckpts.exists(s =>
            isMutation(s.getPath.getName) &&
              ckptKey(s.getPath.getName)._1 == n)
          val dst = checkpointPath(lakeDir, n, gen, mutation = mutAtN,
            fold = mutAtN)
          writeAtomic(fs, lakeDir, dst, files)
          dst.getName
      }
    // cleanup: everything except the snapshot is now subsumed (every
    // live id ≤ n by construction, and the snapshot out-ranks same-id
    // older generations). A crash mid-sweep leaves subsets — correct,
    // just unswept until the next call. Compare by NAME: listed
    // statuses carry fully-qualified URIs and Path equality is URI
    // equality (matching on Path would delete the snapshot itself).
    (ckpts ++ manifests).foreach { s =>
      if (s.getPath.getName != snapshotName) {
        fs.delete(s.getPath, false); ()
      }
    }
  }

  /** Single-writer enforcement for table MUTATIONS (merge/delete):
    * an advisory lock file under the log dir, taken with the
    * filesystem's create-no-overwrite (atomic on HDFS and object
    * stores with conditional put; best-effort on raw local FS —
    * advisory either way). A held lock fails fast — two concurrent
    * copy-on-write mutations would both read the same base version
    * and the second publish would silently drop the first's changes
    * (the lost update Delta's optimistic concurrency also rejects).
    * A crash inside `body` leaves the lock behind; a lock older than
    * `staleMs` is broken on the next attempt — safe, because the
    * mutation it guarded either already published (the checkpoint
    * rename is atomic) or left only uncommitted files for
    * [[vacuum]]. [[graft.streaming.LayoutSink]] takes the same lock
    * per ingest batch: its horizon-0 orphan sweep and a concurrent
    * merge's unpublished rewrite files would otherwise race, and a
    * manifest landing mid-merge could be subsumed-but-dropped by the
    * merge's version checkpoint. */
  /** Same-JVM arbitration in front of the advisory lock file: the
    * file's create-no-overwrite is atomic on HDFS/object stores but a
    * check-then-create race on a raw local FS, so two THREADS of one
    * driver (racing OCC commit sections on local[n]) could both
    * "acquire" it and mint the same batch id. A per-lake ReentrantLock
    * closes that in-process window; cross-process exclusion remains
    * the file's (best-effort on local FS, as documented). */
  private val jvmWriterLocks =
    new ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()

  /** Test seam: the in-process arbitration lock for `lakeDir`, so a
    * spec can occupy the JVM stage alone and assert the `waitMs`
    * bound spans BOTH acquisition stages (one deadline — a contender
    * must not wait up to waitMs on the JVM lock and then up to
    * ANOTHER waitMs on the file lock). */
  private[graft] def jvmLockFor(fs: FileSystem,
      lakeDir: String): java.util.concurrent.locks.ReentrantLock =
    jvmWriterLocks.computeIfAbsent(
      fs.makeQualified(new Path(logDir(lakeDir))).toString,
      _ => new java.util.concurrent.locks.ReentrantLock())

  def withWriterLock[T](fs: FileSystem, lakeDir: String,
      staleMs: Long = 600000L, waitMs: Long = 0L)(body: => T): T = {
    // ONE deadline across both acquisition stages: without it a
    // contender could wait up to waitMs on the in-process lock and
    // then up to ANOTHER waitMs in the file-lock spin — ~2× the bound
    // the caller asked for
    val deadline = System.currentTimeMillis() + waitMs
    val jvmKey = fs.makeQualified(new Path(logDir(lakeDir))).toString
    val jvmLock = jvmWriterLocks.computeIfAbsent(jvmKey,
      _ => new java.util.concurrent.locks.ReentrantLock())
    val jvmHeld =
      if (waitMs > 0) jvmLock.tryLock(waitMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      else jvmLock.tryLock()
    if (!jvmHeld)
      throw new IllegalStateException(
        s"another mutation holds the writer lock on $lakeDir — " +
          "retry after it publishes (in-process contender)")
    val remainingMs =
      if (waitMs > 0) math.max(0L, deadline - System.currentTimeMillis())
      else 0L
    try withFileWriterLock(fs, lakeDir, staleMs, remainingMs)(body)
    finally jvmLock.unlock()
  }

  private def withFileWriterLock[T](fs: FileSystem, lakeDir: String,
      staleMs: Long, waitMs: Long)(body: => T): T = {
    val lock = new Path(logDir(lakeDir), "WRITER_LOCK")
    fs.mkdirs(new Path(logDir(lakeDir)))
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lock, /* overwrite = */ false)
        try out.write(
          s"${System.currentTimeMillis()} ${java.util.UUID.randomUUID()}"
            .getBytes(UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    var held = tryAcquire()
    // `waitMs > 0` turns the fail-fast acquire into a bounded wait —
    // the OCC verbs' COMMIT sections are metadata-scale (milliseconds),
    // so a contender briefly spinning beats failing a whole prepared
    // mutation; long-lock verbs keep the historical fail-fast default.
    val deadline = System.currentTimeMillis() + waitMs
    while (!held && System.currentTimeMillis() < deadline) {
      Thread.sleep(25L)
      held = tryAcquire()
    }
    if (!held) {
      // stale-break must not race: two contenders plainly deleting the
      // stale lock could each also delete the OTHER's fresh
      // replacement and both enter. Break by RENAME instead — only
      // one rename of the old file can succeed — and verify by
      // modtime that the renamed file IS the stale one observed (if a
      // fresh lock slipped in between stat and rename, put it back).
      val observed =
        try Some(fs.getFileStatus(lock))
        catch { case _: FileNotFoundException => None } // just released
      observed match {
        case None => held = tryAcquire()
        case Some(s)
            if System.currentTimeMillis() -
              s.getModificationTime > staleMs =>
          val breaker = new Path(logDir(lakeDir),
            s".stale-lock-${java.util.UUID.randomUUID()}")
          val renamed =
            try fs.rename(lock, breaker)
            catch { case _: java.io.IOException => false }
          if (renamed) {
            val took =
              try fs.getFileStatus(breaker).getModificationTime
              catch { case _: FileNotFoundException => -1L }
            if (took == s.getModificationTime) {
              fs.delete(breaker, false)
              held = tryAcquire()
            } else {
              // we grabbed a FRESH lock by accident — restore it
              fs.rename(breaker, lock); ()
            }
          } else held = tryAcquire() // someone else broke it first
        case _ => () // held and fresh
      }
    }
    if (!held)
      throw new IllegalStateException(
        s"another mutation holds the writer lock on $lakeDir — " +
          s"retry after it publishes (locks older than ${staleMs} ms " +
          "are presumed crashed and broken automatically)")
    try body finally { fs.delete(lock, false); () }
  }

  /** Write-then-rename commit: the manifest appears atomically or not
    * at all (a crashed half-written `.tmp-` never matches the
    * `.manifest` suffix readers look for). */
  def commit(fs: FileSystem, lakeDir: String, batchId: Long,
      files: Seq[String]): Unit =
    writeAtomic(fs, lakeDir, manifestPath(lakeDir, batchId), files)

  /** Publish a checkpoint DIRECTLY (no fold), at a generation above
    * every existing one so it atomically becomes the committed view.
    * [[ZOrder.optimize]] seeds a rewritten lake's log with it;
    * [[ZOrder.compactSmall]] uses it to swap compacted file names for
    * their replacement in one rename. */
  def commitCheckpoint(fs: FileSystem, lakeDir: String, id: Long,
      files: Seq[String]): Unit =
    commitCheckpointImpl(fs, lakeDir, id, files, mutation = false)

  /** A checkpoint that CHANGED row content in place (DML) — same
    * committed-view semantics, but flagged so the history APIs treat
    * the id as rewritten (and, since r10, resolve THROUGH it to the
    * versions below — a DML record sweeps nothing). `dvNames`
    * is the COMPLETE set of deletion-vector sidecar files this
    * version covers (previous covered set ± this mutation's changes):
    * the one atomic rename publishes data files and vector visibility
    * together, so no crash window can show data without its vectors
    * or vectors without their data. `added`/`removed` are the
    * per-commit data-file delta vs the previous version, carried as
    * self-describing `add:`/`rm:` entries ([[history]] surfaces them
    * as churn counts; readers of the view strip them). */
  def commitMutationCheckpoint(fs: FileSystem, lakeDir: String,
      id: Long, files: Seq[String],
      dvNames: Seq[String] = Seq.empty,
      added: Seq[String] = Seq.empty,
      removed: Seq[String] = Seq.empty,
      gen: Option[Long] = None): Unit =
    commitCheckpointImpl(fs, lakeDir, id,
      files ++ dvNames.sorted.map(DvPrefix + _) ++
        added.sorted.map(AddPrefix + _) ++
        removed.sorted.map(RmPrefix + _),
      mutation = true, genOverride = gen)

  /** The generation the NEXT checkpoint publish will take — what a
    * writer (under the lock, so nothing can race the answer) uses to
    * stamp side artifacts (the change-data-feed directory) with the
    * exact version key its publish is about to claim, then passes
    * back via `commitMutationCheckpoint(gen = ...)` so the two can
    * never drift. Floored at 1: gen 0 is the MANIFEST convention
    * (`ckptKey` reads a bare append as `(id, 0)`), so a checkpoint at
    * gen 0 would share a version key with the append whose id it
    * reuses — and a strictly-above version cursor
    * ([[ChangeDataFeed]]) would silently skip the mutation. */
  private[sources] def nextGen(fs: FileSystem, lakeDir: String): Long =
    math.max(1L, listLog(fs, lakeDir)._1
      .map(s => ckptKey(s.getPath.getName)._2)
      .foldLeft(-1L)(math.max) + 1L)

  private def commitCheckpointImpl(fs: FileSystem, lakeDir: String,
      id: Long, files: Seq[String], mutation: Boolean,
      genOverride: Option[Long] = None): Unit = {
    val gen = genOverride.getOrElse(nextGen(fs, lakeDir))
    writeAtomic(fs, lakeDir, checkpointPath(lakeDir, id, gen, mutation),
      files)
  }

  /** [[Constraints]] publishes its definition file with the same
    * write-then-rename atomicity as every log record. */
  private[sources] def writeRecordAtomic(fs: FileSystem, lakeDir: String,
      dst: Path, lines: Seq[String]): Unit =
    writeAtomic(fs, lakeDir, dst, lines)

  /** [[Clone.shallow]] publishes the source pointer atomically too —
    * a half-written pointer must never resolve. */
  private[sources] def writeCloneSource(fs: FileSystem, lakeDir: String,
      sourceDir: String): Unit =
    writeAtomic(fs, lakeDir, cloneSourcePath(lakeDir), Seq(sourceDir))

  private def writeAtomic(fs: FileSystem, lakeDir: String, dst: Path,
      files: Seq[String]): Unit = {
    val log = new Path(logDir(lakeDir))
    fs.mkdirs(log)
    val tmp = new Path(log,
      s".tmp-${dst.getName}-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(UTF_8))
    finally out.close()
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      require(fs.exists(dst),
        s"commit: could not publish ${dst.getName}")
    }
  }
}
