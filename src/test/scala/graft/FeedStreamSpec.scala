package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{ChangeDataFeed, ColumnMapping, CommitLog,
  DeletionVectors, MergeInto}
import graft.sources.MergeInto.NotMatchedInsert
import graft.streaming.FeedStream

/** The change data feed as a streaming source: the one property the
  * MoR change stream cannot have — surviving physical rewrites. CoW
  * DML, MoR DML and a vector-folding compaction all arrive as
  * ordinary feed batches; folding signed deltas reconstructs the
  * lake's aggregate exactly; restarts resume from the checkpointed
  * version; a RESTORE (never captured) still fails loudly. */
class FeedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_fstr_").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(b * 1000 + _).map(k => (k, k.toLong * 2, "x"))
        .toDF("k", "v", "s")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    lake
  }

  /** Fold a feed window into (Δcount, Δsum(v)) signed deltas. */
  private def fold(state: AtomicReference[(Long, Long)])(
      changes: DataFrame, batch: Long): Unit = {
    val add = col("_change_type").isin("insert", "update_postimage")
    val drop = col("_change_type").isin("delete", "update_preimage")
    val r = changes.select(
      sum(when(add, 1L).when(drop, -1L).otherwise(0L)).as("dn"),
      sum(when(add, col("v")).when(drop, -col("v")).otherwise(0L))
        .as("dv")).head
    if (!r.isNullAt(0))
      state.updateAndGet(s => (s._1 + r.getLong(0), s._2 + r.getLong(1)))
    ()
  }

  private def directAgg(lake: String): (Long, Long) = {
    val r = DeletionVectors.readMor(spark, lake)
      .agg(count(lit(1)), sum(col("v"))).head
    (r.getLong(0), r.getLong(1))
  }

  test("the stream survives CoW DML, MoR DML and a compaction, and " +
    "the signed-delta fold tracks the lake exactly") {
    val lake = mkLake()
    val work = Files.createTempDirectory("graft_fstr_ck_").toString
    ChangeDataFeed.enable(spark, lake)
    val state = new AtomicReference[(Long, Long)]((0L, 0L))
    val q = FeedStream.start(spark, lake, s"$work/ckp", pollMs = 25L,
      initialSnapshot = true)(fold(state))
    try {
      // CoW verbs — these KILL the MoR change stream; the feed
      // stream crosses them as ordinary batches
      MergeInto.update(spark, lake, "k < 5", Map("v" -> "v + 1000"))
      q.processAllAvailable()
      MergeInto.delete(spark, lake, "k = 2000")
      q.processAllAvailable()
      // MoR + physical compaction (also lethal to position tracking)
      DeletionVectors.deleteMor(spark, lake, "k = 1001")
      DeletionVectors.compact(spark, lake)
      q.processAllAvailable()
      // clause merge insert + a plain append batch
      MergeInto.mergeClauses(spark, lake,
        Seq((9999, 9L)).toDF("k", "nv"), Seq("k"),
        notMatched = Seq(NotMatchedInsert(
          Map("k" -> "s.k", "v" -> "s.nv", "s" -> "'new'"))))
      val f = fs(lake)
      val before = CommitLog.dataFileNames(f, lake)
      Seq((5000, 1L, "b3")).toDF("k", "v", "s")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, 3,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
      q.processAllAvailable()
    } finally q.stop()
    assert(q.exception.isEmpty, q.exception.toString)
    assert(q.batchesProcessed >= 5L, s"${q.batchesProcessed} batches")
    assert(state.get() == directAgg(lake),
      s"folded ${state.get()} vs direct ${directAgg(lake)}")
  }

  test("restart resumes from the checkpointed version: nothing " +
    "re-served, nothing skipped") {
    val lake = mkLake()
    val work = Files.createTempDirectory("graft_fstr_ck2_").toString
    ChangeDataFeed.enable(spark, lake)
    val state = new AtomicReference[(Long, Long)]((0L, 0L))
    val q1 = FeedStream.start(spark, lake, s"$work/ckp", pollMs = 25L,
      initialSnapshot = true)(fold(state))
    try {
      MergeInto.update(spark, lake, "k = 7", Map("v" -> "0"))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = state.get()
    // mutations while the stream is DOWN
    MergeInto.delete(spark, lake, "k = 8")
    // restart on the same checkpoint: initialSnapshot is ignored (no
    // snapshot re-serve), only the missed window arrives
    val q2 = FeedStream.start(spark, lake, s"$work/ckp", pollMs = 25L,
      initialSnapshot = true)(fold(state))
    try q2.processAllAvailable() finally q2.stop()
    assert(q2.exception.isEmpty, q2.exception.toString)
    assert(state.get() == directAgg(lake))
    assert(state.get()._1 == afterFirst._1 - 1)
  }

  test("a failing snapshot batch under a CONCURRENT mutation re-pins " +
    "and re-serves (batch-granularity at-least-once); a failure with " +
    "a stable version rethrows as the consumer's own") {
    val lake = mkLake()
    val work = Files.createTempDirectory("graft_fstr_ck5_").toString
    ChangeDataFeed.enable(spark, lake)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    // the snapshot is served LAZILY (no 100 TB materialization), so a
    // mutation sweeping pinned files mid-read surfaces as a batch
    // failure with a MOVED version — simulated here: attempt 1 commits
    // a mutation and throws; the bootstrap must re-pin and re-serve
    val q = FeedStream.start(spark, lake, s"$work/ckp", pollMs = 25L,
      initialSnapshot = true) { (changes, _) =>
      if (calls.incrementAndGet() == 1) {
        MergeInto.update(spark, lake, "k = 0", Map("v" -> "-1"))
        throw new RuntimeException("simulated mid-read sweep")
      }
      rows.addAndGet(changes.count()); ()
    }
    try q.processAllAvailable() finally q.stop()
    assert(q.exception.isEmpty, q.exception.toString)
    assert(calls.get() == 2, s"${calls.get()} attempts")
    // the re-pinned snapshot already CONTAINS the mutation (its
    // version is the post-update one) — nothing re-served later
    assert(rows.get() == 300L, s"${rows.get()} rows")
    // a consumer failure with the version UNCHANGED is not retried
    val work2 = Files.createTempDirectory("graft_fstr_ck6_").toString
    val ex = intercept[RuntimeException] {
      FeedStream.start(spark, lake, s"$work2/ckp", pollMs = 25L,
        initialSnapshot = true) { (_, _) =>
        throw new RuntimeException("consumer bug")
      }
    }
    assert(ex.getMessage == "consumer bug")
  }

  test("a rename chain that reuses a retired physical name never " +
    "relabels a live column: batches arrive in logical names, mapped " +
    "exactly once") {
    val lake = mkLake() // logical/physical columns k, v, s
    val work = Files.createTempDirectory("graft_fstr_ck4_").toString
    ChangeDataFeed.enable(spark, lake)
    // retire physical 'v' (v -> tmp), then REUSE 'v' as the logical
    // name of physical 'k' (k -> v). The feed already serves LOGICAL
    // names; a second physical->logical pass over such a frame would
    // match the live logical 'v' against the retired physical 'v' and
    // relabel it 'tmp' — two 'tmp' columns, the live one corrupted
    ColumnMapping.rename(spark, lake, "v", "tmp")
    ColumnMapping.rename(spark, lake, "k", "v")
    val seen = new AtomicReference[Set[Seq[String]]](Set.empty)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = FeedStream.start(spark, lake, s"$work/ckp", pollMs = 25L,
      initialSnapshot = true) { (changes, _) =>
      seen.updateAndGet(_ + changes.columns.toSeq.sorted)
      rows.addAndGet(changes.count()); ()
    }
    try {
      // one post-rename append batch so pollOnce's window path is
      // exercised too (raw files carry the shared PHYSICAL schema)
      val f = fs(lake)
      val before = CommitLog.dataFileNames(f, lake)
      Seq((5000, 1L, "b3")).toDF("k", "v", "s")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, 3,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
      q.processAllAvailable()
    } finally q.stop()
    assert(q.exception.isEmpty, q.exception.toString)
    val expected = Seq("s", "tmp", "v", ChangeDataFeed.ChangeTypeCol,
      ChangeDataFeed.CommitIdCol, ChangeDataFeed.CommitGenCol).sorted
    assert(seen.get() == Set(expected),
      s"column sets seen: ${seen.get()}")
    assert(rows.get() == 301L, s"${rows.get()} rows") // 300 snap + 1
  }

  test("a RESTORE still fails the stream loudly — rollbacks are not " +
    "expressible as feed rows") {
    val lake = mkLake()
    val work = Files.createTempDirectory("graft_fstr_ck3_").toString
    ChangeDataFeed.enable(spark, lake)
    val q = FeedStream.start(spark, lake, s"$work/ckp",
      pollMs = 25L)((_, _) => ())
    try {
      // a MoR delete first (sweeps nothing, so the restore below can
      // still resurrect the old view's bytes): the stream serves it
      DeletionVectors.deleteMor(spark, lake, "k = 1")
      q.processAllAvailable()
      CommitLog.restore(fs(lake), lake, 1L)
      val deadline = System.currentTimeMillis() + 30000L
      while (q.exception.isEmpty &&
          System.currentTimeMillis() < deadline) Thread.sleep(25L)
      assert(q.exception.exists(
        _.getMessage.contains("no change data")), q.exception.toString)
    } finally q.stop()
  }
}
