package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{ColumnMapping, CommitLog, DeletionVectors}
import graft.sources.DeletionVectors.MorCursor

/** CDC as a STREAMING SOURCE — the row-level change feed
  * ([[DeletionVectors.readMorChanges]]: `insert` / `delete` rows with
  * full values, MoR updates and merges decomposing into both) wrapped
  * in a micro-batched query, so a downstream table or view maintains
  * itself from a LIVE feed without manual cursor plumbing. Before
  * r11 the feed was cursor-poll batch only (`q74_dv_changes`): the
  * consumer captured a [[MorCursor]], remembered it somewhere, read
  * the window, advanced — this object owns that loop.
  *
  * Per micro-batch, the poller: (1) pins the HEAD version with one
  * atomic log resolution ([[DeletionVectors.cursor]]); (2) when it
  * moved, reads exactly the `(last, head]` change window — the same
  * pinned-window read the batch API serves, so a mutation racing the
  * poll can never tear a batch (it lands in the next window whole);
  * (3) invokes `onBatch(changes, batchId)`; (4) checkpoints the head
  * cursor (write-then-rename, atomic) and advances. Delivery is
  * AT-LEAST-ONCE at batch granularity: a crash between (3) and (4)
  * replays the window against the same consumer — consumers are
  * idempotent in (batchId, window) exactly as `foreachBatch` users
  * are, and signed-delta folds (the incremental-view shape) are
  * batching-invariant outright. A restart resumes from the
  * checkpointed cursor: nothing is re-served, nothing skipped.
  *
  * SOUNDNESS is inherited, loud, and TYPED: a physical rewrite under
  * the stream (CoW DML, OPTIMIZE, `compact`) invalidates row-level
  * tracking, so the poll throws
  * [[DeletionVectors.CursorInvalidatedException]] — the query
  * terminates, [[ChangeStreamQuery.exception]] carries the typed
  * cause and [[ChangeStreamQuery.awaitTermination]] rethrows it. The
  * consumer's documented recovery is the batch API's: full re-read,
  * fresh stream. `qs20_stream_cdc` is the oracle twin (a live
  * delete/update/merge mix folded through the feed hash-matches the
  * declaratively-computed end state); `ChangeStreamSpec` pins the
  * lifecycle, restart resume and the guard trip.
  *
  * 100 TB shape: each poll is one log listing (metadata); each batch
  * reads ONLY the window's new files and newly-touched positions —
  * cost ∝ churn, never O(lake). The feed carries logical column
  * names ([[ColumnMapping]] applied), like every committed read. */
object ChangeStream {

  /** Handle to a running change-feed query — the lifecycle surface of
    * a `StreamingQuery`, minus the Spark-internal machinery the
    * driver-side poll loop does not need. */
  final class ChangeStreamQuery private[ChangeStream] (
      spark: SparkSession, lakeDir: String, checkpointDir: String,
      pollMs: Long, onBatch: (DataFrame, Long) => Unit,
      initialSnapshot: Boolean) {

    private val failure = new AtomicReference[Throwable](null)
    private val last = new AtomicReference[MorCursor](null)
    @volatile private var stopRequested = false
    @volatile private var batches = 0L

    private def fs = new Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def ckptPath = new Path(checkpointDir, "CURSOR")

    private def writeCheckpoint(c: MorCursor): Unit = {
      val f = fs
      f.mkdirs(new Path(checkpointDir))
      val tmp = new Path(checkpointDir,
        s".CURSOR.tmp-${java.util.UUID.randomUUID()}")
      val lines =
        c.files.toSeq.sorted.map("file\t" + _) ++
          c.dvFiles.toSeq.sorted.map("dv\t" + _)
      val out = f.create(tmp, true)
      try out.write(lines.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      // Atomic pointer flip (the CommitLog / VectorIndex publish
      // idiom). FileSystem.rename refuses to overwrite on HDFS/object
      // stores, and a delete-then-rename fallback has a crash window
      // with NO checkpoint — a restart would then bootstrap fresh and
      // either skip every change since the lost cursor or re-serve a
      // full snapshot. Rename.OVERWRITE replaces the old cursor in one
      // metadata operation: the checkpoint is always either the
      // previous cursor or the new one, never absent.
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(ckptPath),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

    private def readCheckpoint(): Option[MorCursor] = {
      val f = fs
      if (!f.exists(ckptPath)) return None
      val in = f.open(ckptPath)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val (files, dv) = (Set.newBuilder[String], Set.newBuilder[String])
      text.split('\n').filter(_.nonEmpty).foreach { line =>
        line.split('\t') match {
          case Array("file", n) => files += n
          case Array("dv", n) => dv += n
          case _ => throw new IllegalArgumentException(
            s"corrupt change-stream checkpoint line: '$line'")
        }
      }
      Some(MorCursor(files.result(), dv.result()))
    }

    /** One poll: serve the `(last, head]` window if the head moved.
      * Returns true when a batch was served. */
    private def pollOnce(): Boolean = {
      val head = DeletionVectors.cursor(spark, lakeDir)
      if (head == last.get()) return false
      val changes = ColumnMapping.toLogical(spark, lakeDir,
        DeletionVectors.readMorChanges(spark, lakeDir,
          from = last.get(), to = Some(head), mergeSchema = true))
      onBatch(changes, batches)
      writeCheckpoint(head)
      last.set(head)
      batches += 1
      true
    }

    private[ChangeStream] def bootstrap(): Unit = {
      readCheckpoint() match {
        case Some(c) => last.set(c) // restart: resume, never re-serve
        case None =>
          val head = DeletionVectors.cursor(spark, lakeDir)
          if (initialSnapshot) {
            // batch 0 = the whole current version as inserts, so a
            // consumer folding the feed reconstructs the FULL state,
            // not just the post-start delta (Delta's
            // startingVersion=0 shape). Served through the same
            // pinned-window read: from = the empty version.
            last.set(MorCursor(Set.empty, Set.empty))
            val snap = ColumnMapping.toLogical(spark, lakeDir,
              DeletionVectors.readMorChanges(spark, lakeDir,
                from = MorCursor(Set.empty, Set.empty),
                to = Some(head), mergeSchema = true))
            onBatch(snap, 0L)
            writeCheckpoint(head)
            last.set(head)
            batches = 1L
          } else {
            // changes AFTER start only
            writeCheckpoint(head)
            last.set(head)
          }
      }
    }

    private val thread = new Thread(() => {
      try {
        while (!stopRequested) {
          if (!pollOnce()) Thread.sleep(pollMs)
        }
      } catch {
        case t: Throwable => failure.set(t)
      }
    }, s"graft-change-stream-${java.util.UUID.randomUUID()}")
    thread.setDaemon(true)

    def isActive: Boolean = thread.isAlive
    def exception: Option[Throwable] = Option(failure.get())
    def batchesProcessed: Long = batches

    /** Block until the feed has served every change committed BEFORE
      * this call — the `StreamingQuery.processAllAvailable` contract,
      * what a test or a drain-then-stop shutdown uses. Rethrows a
      * poll failure. */
    def processAllAvailable(timeoutMs: Long = 120000L): Unit = {
      val target = DeletionVectors.cursor(spark, lakeDir)
      val deadline = System.currentTimeMillis() + timeoutMs
      while (last.get() == null ||
          !target.files.subsetOf(last.get().files) ||
          !target.dvFiles.subsetOf(last.get().dvFiles)) {
        exception.foreach(throw _)
        require(thread.isAlive, "change stream terminated")
        require(System.currentTimeMillis() < deadline,
          s"processAllAvailable: feed did not catch up in ${timeoutMs}ms")
        Thread.sleep(25L)
      }
      exception.foreach(throw _)
    }

    /** Graceful stop: the in-flight batch finishes and checkpoints. */
    def stop(): Unit = {
      stopRequested = true
      thread.join(120000L)
    }

    /** Wait for termination (stop or failure); a poll failure —
      * including the TYPED [[DeletionVectors.CursorInvalidatedException]]
      * a mid-stream physical rewrite raises — is rethrown here. */
    def awaitTermination(timeoutMs: Long = 300000L): Unit = {
      thread.join(timeoutMs)
      exception.foreach(throw _)
    }

    private[ChangeStream] def startThread(): Unit = thread.start()
  }

  /** Start a change-feed query over `lakeDir`. `onBatch` receives the
    * window's change rows (the lake schema + `_change_type`
    * insert/delete, logical column names) and the batch id; it runs
    * on the poller thread, serially, exactly like `foreachBatch`.
    * `initialSnapshot` serves the current version as batch 0 of
    * inserts (ignored when a checkpoint exists — restarts resume). */
  def start(spark: SparkSession, lakeDir: String, checkpointDir: String,
      pollMs: Long = 100L, initialSnapshot: Boolean = false)(
      onBatch: (DataFrame, Long) => Unit): ChangeStreamQuery = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"change stream: $lakeDir has no commit log — no change tracking")
    val q = new ChangeStreamQuery(spark, lakeDir, checkpointDir, pollMs,
      onBatch, initialSnapshot)
    q.bootstrap() // synchronous: the snapshot batch (if any) is served
    q.startThread() //   before start() returns, deterministically
    q
  }
}
