package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ChangeDataFeed, CommitLog}
import graft.sources.ChangeDataFeed.Version

/** The CHANGE DATA FEED as a streaming source — [[ChangeStream]]'s
  * loop over [[ChangeDataFeed.read]] instead of the MoR position
  * feed, which buys the one property ChangeStream cannot have:
  * **the stream survives physical rewrites.** A CoW
  * UPDATE/DELETE/MERGE, a MoR verb, or a vector-folding compaction
  * all arrive as ordinary feed batches (pre/post images, deletes,
  * inserts, or an empty compaction stamp) instead of killing the
  * query with `CursorInvalidatedException` — Delta's
  * `readChangeFeed` stream against the same lake verbs. The price:
  * the lake must have the feed ENABLED ([[ChangeDataFeed.enable]])
  * before the first mutation the stream must cross.
  *
  * Per micro-batch: (1) resolve the head [[Version]] (one log
  * listing, metadata-scale); (2) if it moved past the cursor, read
  * exactly the `(last, head]` feed window — mutation segments from
  * their `_cdf` directories, append segments from the committed
  * files; (3) `onBatch(changes, batchId)` — rows carry the lake's
  * LOGICAL column names plus `_change_type`/`_commit_id`/
  * `_commit_gen`; (4) checkpoint the cursor (atomic
  * rename-OVERWRITE pointer flip) and advance. At-least-once at
  * batch granularity, exactly [[ChangeStream]]'s contract; restarts
  * resume from the checkpointed version — nothing re-served, nothing
  * skipped.
  *
  * Still-loud windows (the feed's own fail-fast contract, surfaced
  * through [[FeedStreamQuery.exception]]): an append segment whose
  * files a later mutation already rewrote and swept before the
  * stream consumed it (poll faster than you mutate, or start past
  * it), a RESTORE (never captured — consumers must resync), and a
  * truncating fold/OPTIMIZE past the cursor. A mutation with change
  * data — the common case — never kills the stream.
  *
  * 100 TB shape: polls are log listings; a batch reads change bytes
  * ∝ the window's churn (mutation `_cdf` files + newly appended
  * files), never O(lake). */
object FeedStream {

  final class FeedStreamQuery private[FeedStream] (
      spark: SparkSession, lakeDir: String, checkpointDir: String,
      pollMs: Long, onBatch: (DataFrame, Long) => Unit,
      initialSnapshot: Boolean) {

    private val failure = new AtomicReference[Throwable](null)
    private val last = new AtomicReference[Version](null)
    @volatile private var stopRequested = false
    @volatile private var batches = 0L

    private def fs = new Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def ckptPath = new Path(checkpointDir, "CURSOR")

    private def writeCheckpoint(v: Version): Unit = {
      val f = fs
      f.mkdirs(new Path(checkpointDir))
      val tmp = new Path(checkpointDir,
        s".CURSOR.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(s"${v.id}\t${v.gen}".getBytes("UTF-8"))
      finally out.close()
      // atomic pointer flip — the checkpoint is always the previous
      // cursor or the new one, never absent (ChangeStream's idiom)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(ckptPath),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

    private def readCheckpoint(): Option[Version] = {
      val f = fs
      if (!f.exists(ckptPath)) return None
      val in = f.open(ckptPath)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.trim.split('\t') match {
        case Array(i, g) => Some(Version(i.toLong, g.toLong))
        case _ => throw new IllegalArgumentException(
          s"corrupt feed-stream checkpoint: '$text'")
      }
    }

    private def pollOnce(): Boolean = {
      val head = ChangeDataFeed.currentVersion(spark, lakeDir)
      if (head <= last.get()) return false
      // ChangeDataFeed.read already projects every segment through
      // ColumnMapping.toLogical — mapping again here would re-apply
      // the rename table to ALREADY-LOGICAL names, which corrupts the
      // batch whenever a retired physical name was reused as another
      // column's logical name (rename y->tmp, x->y), so the window
      // passes through unchanged.
      val window = ChangeDataFeed.read(spark, lakeDir,
        last.get(), head)
      onBatch(window, batches)
      writeCheckpoint(head)
      last.set(head)
      batches += 1
      true
    }

    private[FeedStream] def bootstrap(): Unit = {
      readCheckpoint() match {
        case Some(v) => last.set(v) // restart: resume, never re-serve
        case None =>
          if (initialSnapshot) {
            // batch 0 = the whole current version as inserts, pinned:
            // retry until the version is identical before and after
            // building the snapshot frame, so the served rows and the
            // recorded cursor are the same published version
            var attempt = 0
            var done = false
            def overrun(): Unit = {
              attempt += 1
              require(attempt < 20,
                "feed stream: could not pin a stable snapshot " +
                  "version in 20 attempts — the lake is mutating " +
                  "faster than the bootstrap can read it")
            }
            while (!done) {
              val v1 = ChangeDataFeed.currentVersion(spark, lakeDir)
              // readCommitted already emits LOGICAL names — no second
              // mapping pass. The snapshot is served LAZILY (a 100 TB
              // batch 0 must never materialize into local storage);
              // the v1==v2 gate catches mutations landing while the
              // frame is BUILT, and a sweep landing while it is READ
              // (a CoW rewrite + vacuum inside onBatch) surfaces as a
              // read failure with a MOVED version — re-pin and
              // re-serve the whole attempt, which is exactly the
              // declared at-least-once-at-batch-granularity contract.
              // A failure with the version UNCHANGED is the consumer's
              // own and rethrows.
              val snap = LayoutSink.readCommitted(spark, lakeDir)
                .withColumn(ChangeDataFeed.ChangeTypeCol, lit("insert"))
                .withColumn(ChangeDataFeed.CommitIdCol, lit(v1.id))
                .withColumn(ChangeDataFeed.CommitGenCol, lit(v1.gen))
              val v2 = ChangeDataFeed.currentVersion(spark, lakeDir)
              if (v1 == v2) {
                last.set(v1)
                try {
                  onBatch(snap, 0L)
                  writeCheckpoint(v1)
                  batches = 1L
                  done = true
                } catch {
                  case t: Throwable =>
                    if (ChangeDataFeed.currentVersion(spark, lakeDir)
                        == v1) throw t
                    overrun()
                }
              } else overrun()
            }
          } else {
            val head = ChangeDataFeed.currentVersion(spark, lakeDir)
            writeCheckpoint(head) // changes AFTER start only
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
    }, s"graft-feed-stream-${java.util.UUID.randomUUID()}")
    thread.setDaemon(true)

    def isActive: Boolean = thread.isAlive
    def exception: Option[Throwable] = Option(failure.get())
    def batchesProcessed: Long = batches

    /** Block until every version committed BEFORE this call has been
      * served ([[ChangeStream]]'s `processAllAvailable` contract). */
    def processAllAvailable(timeoutMs: Long = 120000L): Unit = {
      val target = ChangeDataFeed.currentVersion(spark, lakeDir)
      val deadline = System.currentTimeMillis() + timeoutMs
      while (last.get() == null || last.get() < target) {
        exception.foreach(throw _)
        require(thread.isAlive, "feed stream terminated")
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

    /** Wait for termination; a poll failure (a swept window, a
      * RESTORE, a truncating fold) is rethrown here. */
    def awaitTermination(timeoutMs: Long = 300000L): Unit = {
      thread.join(timeoutMs)
      exception.foreach(throw _)
    }

    private[FeedStream] def startThread(): Unit = thread.start()
  }

  /** Start a change-data-feed query over `lakeDir`. `onBatch` runs
    * serially on the poller thread (`foreachBatch` semantics) with
    * the window's rows: lake columns under logical names plus
    * `_change_type` / `_commit_id` / `_commit_gen`.
    * `initialSnapshot` serves the current version as batch 0 of
    * inserts (ignored when a checkpoint exists — restarts resume). */
  def start(spark: SparkSession, lakeDir: String, checkpointDir: String,
      pollMs: Long = 100L, initialSnapshot: Boolean = false)(
      onBatch: (DataFrame, Long) => Unit): FeedStreamQuery = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"feed stream: $lakeDir has no commit log — no change tracking")
    val q = new FeedStreamQuery(spark, lakeDir, checkpointDir, pollMs,
      onBatch, initialSnapshot)
    q.bootstrap() // synchronous: the snapshot batch (if any) is served
    q.startThread() //   before start() returns, deterministically
    q
  }
}
