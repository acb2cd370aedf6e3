package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.StatsIndex
import graft.streaming.LayoutSink

/** Streaming ingest → z-ordered lake + live stats index: rows must
  * round-trip exactly across micro-batch boundaries, and the index
  * must both PRUNE (batch-local z-files are narrow) and stay CORRECT
  * (pruned scan ≡ full filter) after multi-batch ingest. */
class LayoutSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val work = {
    val dir = Files.createTempDirectory("graft_lsink_").toString
    val in = (0 until 20000).map { i =>
      ((i * 7919L) % 4096, (i * 104729L) % 4096, i.toLong)
    }.toDF("x", "y", "payload")
    in.repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = LayoutSink.start(stream, s"$dir/lake", s"$dir/idx",
      s"$dir/ckp", Seq("x", "y"), filesPerBatch = 4)
    q.awaitTermination()
    dir
  }

  test("rows round-trip exactly across micro-batches") {
    val lake = spark.read.parquet(s"$work/lake")
    assert(lake.count() == 20000)
    assert(lake.agg(sum($"payload")).head.getLong(0) ==
      (0L until 20000).sum)
    assert(lake.select($"payload").distinct().count() == 20000)
  }

  test("index covers every lake file and pruned scan == full filter") {
    val lakeFiles = spark.read.parquet(s"$work/lake")
      .select(input_file_name()).distinct().count()
    val idxFiles = StatsIndex.prunedFiles(spark, s"$work/idx", Nil).size
    assert(idxFiles == lakeFiles, s"index $idxFiles vs lake $lakeFiles")
    val box = Seq(("x", 100L, 600L), ("y", 2000L, 2500L))
    val got = StatsIndex.readPruned(spark, s"$work/lake", s"$work/idx", box)
      .agg(count(lit(1)), sum($"payload")).head()
    val want = spark.read.parquet(s"$work/lake")
      .filter($"x".between(100, 600) && $"y".between(2000, 2500))
      .agg(count(lit(1)), sum($"payload")).head()
    assert(got == want, s"pruned $got vs full $want")
  }

  test("OPTIMIZE re-clusters batch-local files into global z-order") {
    val dir = Files.createTempDirectory("graft_lopt_").toString
    val in = (0 until 20000).map { i =>
      ((i * 7919L) % 4096, (i * 104729L) % 4096, i.toLong)
    }.toDF("x", "y", "payload")
    in.repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    // ingest AND re-cluster on the hilbert curve — exercises the curve
    // dispatch end to end (the other tests cover the morton default)
    LayoutSink.start(stream, s"$dir/lake", s"$dir/idx", s"$dir/ckp",
      Seq("x", "y"), filesPerBatch = 4, curve = "hilbert")
      .awaitTermination()
    val box = Seq(("x", 1000L, 1500L), ("y", 1000L, 1500L))
    val before = StatsIndex.prunedFiles(spark, s"$dir/idx", box).size
    graft.sources.ZOrder.optimize(spark, s"$dir/lake", Seq("x", "y"),
      bits = 10, numFiles = 16, indexDir = Some(s"$dir/idx"),
      curve = "hilbert")
    // rows survive the rewrite bit-exactly
    val lake = spark.read.parquet(s"$dir/lake")
    assert(lake.count() == 20000 &&
      lake.agg(sum($"payload")).head.getLong(0) == (0L until 20000).sum)
    // the refreshed index matches the rewritten lake
    val idxFiles = StatsIndex.prunedFiles(spark, s"$dir/idx", Nil).size
    val lakeFiles = lake.select(input_file_name()).distinct().count()
    assert(idxFiles == lakeFiles)
    // global order: the same box needs no MORE files than the
    // batch-local layout did out of the same total (16), and few overall
    val after = StatsIndex.prunedFiles(spark, s"$dir/idx", box).size
    assert(after <= before, s"box files $before -> $after after OPTIMIZE")
    // a 12%-per-dim box maps to a handful of Hilbert-curve segments —
    // well under half the 16 files
    assert(after <= 6, s"global order should confine a 12% box: $after")
    // the DEFAULT (morton) optimize path end to end on the same lake:
    // rows survive a second rewrite and the index keeps matching
    graft.sources.ZOrder.optimize(spark, s"$dir/lake", Seq("x", "y"),
      bits = 10, numFiles = 16, indexDir = Some(s"$dir/idx"))
    val lake2 = spark.read.parquet(s"$dir/lake")
    assert(lake2.count() == 20000 &&
      lake2.agg(sum($"payload")).head.getLong(0) == (0L until 20000).sum)
    val mortonBox = StatsIndex.prunedFiles(spark, s"$dir/idx", box).size
    assert(mortonBox <= 8, s"morton OPTIMIZE box files: $mortonBox")
  }

  test("exactly-once: a batch retried after crash-before-commit lands " +
    "each row once; replay after commit is a no-op") {
    val dir = Files.createTempDirectory("graft_lxo_").toString
    val lake = s"$dir/lake"
    def mkBatch(from: Int, until: Int) = (from until until).map { i =>
      ((i * 7919L) % 4096, (i * 104729L) % 4096, i.toLong)
    }.toDF("x", "y", "payload")
    def process(df: org.apache.spark.sql.DataFrame, id: Long,
        crash: Boolean = false): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("x", "y"),
        bits = 10, filesPerBatch = 2, curve = "morton",
        failAfterWrite = crash)
    process(mkBatch(0, 1000), 0)
    // batch 1, attempt 1: data files land, the manifest does not
    intercept[RuntimeException] { process(mkBatch(1000, 2000), 1,
      crash = true) }
    // inside the crash window the committed read surface is unscathed
    assert(LayoutSink.readCommitted(spark, lake).count() == 1000)
    // the retry (what a restarted query replays) cleans the orphans
    // and commits — each row exactly once, even for the PLAIN reader
    process(mkBatch(1000, 2000), 1)
    val full = spark.read.parquet(lake)
    assert(full.count() == 2000)
    assert(full.select($"payload").distinct().count() == 2000)
    assert(full.agg(sum($"payload")).head.getLong(0) == (0L until 2000).sum)
    assert(LayoutSink.readCommitted(spark, lake).count() == 2000)
    // the post-commit index saw only committed files
    val idxFiles = StatsIndex.prunedFiles(spark, s"$dir/idx", Nil).size
    val lakeFiles = full.select(input_file_name()).distinct().count()
    assert(idxFiles == lakeFiles, s"index $idxFiles vs lake $lakeFiles")
    // replay AFTER commit (restart at the checkpoint boundary): no-op
    process(mkBatch(1000, 2000), 1)
    assert(spark.read.parquet(lake).count() == 2000)
    // crash on the FIRST batch of a fresh lake: the bootstrap manifest
    // keeps the retry from mistaking pre-existing data for orphans
    // while still cleaning the crashed attempt's files
    val lake2 = s"$dir/lake2"
    mkBatch(0, 500).write.parquet(lake2) // bootstrap data, no log
    intercept[RuntimeException] {
      LayoutSink.processBatch(mkBatch(500, 900), 0, lake2, s"$dir/idx2",
        Seq("x", "y"), 10, 2, "morton", failAfterWrite = true)
    }
    LayoutSink.processBatch(mkBatch(500, 900), 0, lake2, s"$dir/idx2",
      Seq("x", "y"), 10, 2, "morton")
    val full2 = spark.read.parquet(lake2)
    assert(full2.count() == 900)
    assert(full2.select($"payload").distinct().count() == 900)
  }

  test("a crash between commit and index refresh converges on replay") {
    val dir = Files.createTempDirectory("graft_lcir_").toString
    val lake = s"$dir/lake"
    def mkBatch(from: Int, until: Int) = (from until until).map { i =>
      ((i * 7919L) % 4096, (i * 104729L) % 4096, i.toLong)
    }.toDF("x", "y", "payload")
    def process(df: org.apache.spark.sql.DataFrame, id: Long,
        crashPostCommit: Boolean = false): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("x", "y"),
        bits = 10, filesPerBatch = 2, curve = "morton",
        failAfterCommit = crashPostCommit)
    process(mkBatch(0, 1000), 0)
    // batch 1 commits its manifest, then dies before the index refresh
    intercept[RuntimeException] { process(mkBatch(1000, 2000), 1,
      crashPostCommit = true) }
    // data is committed...
    assert(LayoutSink.readCommitted(spark, lake).count() == 2000)
    // ...but the index lags the lake: a pruned scan would drop rows
    val lakeFiles = spark.read.parquet(lake)
      .select(input_file_name()).distinct().count()
    assert(StatsIndex.prunedFiles(spark, s"$dir/idx", Nil).size
      < lakeFiles, "precondition: index must lag inside the window")
    // the replay (restart at the checkpoint boundary) sees the
    // manifest, skips the data, and converges the index
    process(mkBatch(1000, 2000), 1)
    assert(StatsIndex.prunedFiles(spark, s"$dir/idx", Nil).size
      == lakeFiles)
    val got = StatsIndex.readPruned(spark, lake, s"$dir/idx",
      Seq(("x", 0L, 4095L))).count()
    assert(got == 2000, s"pruned scan sees $got of 2000 after replay")
  }

  test("OPTIMIZE on a sink lake drops crash orphans and keeps " +
    "exactly-once across the swap") {
    val dir = Files.createTempDirectory("graft_lopx_").toString
    val lake = s"$dir/lake"
    def mkBatch(from: Int, until: Int) = (from until until).map { i =>
      ((i * 7919L) % 4096, (i * 104729L) % 4096, i.toLong)
    }.toDF("x", "y", "payload")
    def process(df: org.apache.spark.sql.DataFrame, id: Long,
        crash: Boolean = false): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("x", "y"),
        bits = 10, filesPerBatch = 2, curve = "morton",
        failAfterWrite = crash)
    process(mkBatch(0, 1000), 0)
    process(mkBatch(1000, 2000), 1)
    // batch 2 leaves orphans on disk, no manifest
    intercept[RuntimeException] { process(mkBatch(2000, 3000), 2,
      crash = true) }
    // an operator runs OPTIMIZE inside the outage window: the rewrite
    // must take the COMMITTED view — orphans are not baked in
    graft.sources.ZOrder.optimize(spark, lake, Seq("x", "y"),
      bits = 10, numFiles = 4, indexDir = Some(s"$dir/idx"))
    assert(spark.read.parquet(lake).count() == 2000,
      "OPTIMIZE must not promote uncommitted orphans")
    // the restarted query replays batch 2: lands exactly once
    process(mkBatch(2000, 3000), 2)
    // replays of batches committed BEFORE the optimize still no-op
    // (their ids were carried across the swap)
    process(mkBatch(1000, 2000), 1)
    val full = spark.read.parquet(lake)
    assert(full.count() == 3000)
    assert(full.select($"payload").distinct().count() == 3000)
    assert(LayoutSink.readCommitted(spark, lake).count() == 3000)
  }

  test("log checkpoint folds manifests, bounds the log, and keeps " +
    "replay + crash-recovery semantics intact") {
    import org.apache.hadoop.fs.Path
    import graft.sources.CommitLog
    val dir = Files.createTempDirectory("graft_lckp_").toString
    val lake = s"$dir/lake"
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkBatch(from: Int, until: Int) = (from until until).map { i =>
      ((i * 7919L) % 4096, (i * 104729L) % 4096, i.toLong)
    }.toDF("x", "y", "payload")
    def process(df: org.apache.spark.sql.DataFrame, id: Long,
        crash: Boolean = false): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("x", "y"),
        bits = 10, filesPerBatch = 2, curve = "morton",
        failAfterWrite = crash, checkpointEvery = 4)
    (0 until 8).foreach(b => process(mkBatch(b * 500, (b + 1) * 500), b))
    // the fold keeps the live log at or under the threshold: without
    // it 9 records would be listed+parsed per batch (8 + bootstrap)
    assert(CommitLog.recordCount(fs, lake) <= 5,
      s"log should have folded: ${CommitLog.recordCount(fs, lake)} records")
    assert(LayoutSink.readCommitted(spark, lake).count() == 4000)
    // a replay of a batch whose MANIFEST was folded away must still
    // no-op — the checkpoint id subsumes it (double-land otherwise)
    process(mkBatch(0, 500), 0)
    assert(spark.read.parquet(lake).count() == 4000)
    // crash-before-commit AFTER a fold: the retry's orphan sweep takes
    // the committed set from the checkpoint and still heals the lake
    intercept[RuntimeException] { process(mkBatch(4000, 4500), 8,
      crash = true) }
    assert(LayoutSink.readCommitted(spark, lake).count() == 4000)
    process(mkBatch(4000, 4500), 8)
    val full = spark.read.parquet(lake)
    assert(full.count() == 4500)
    assert(full.select($"payload").distinct().count() == 4500)
    // crash BETWEEN checkpoint publish and manifest cleanup: simulate
    // by publishing a snapshot at the current max id while the
    // manifests it subsumes are still on disk — the committed view is
    // unchanged (subsumed manifests are subsets), and the next fold
    // sweeps the log down to the single snapshot
    val before = CommitLog.committedNames(fs, lake)
    CommitLog.commitCheckpoint(fs, lake,
      CommitLog.maxCommittedId(fs, lake), before.toSeq.sorted)
    assert(CommitLog.committedNames(fs, lake) == before)
    CommitLog.checkpoint(fs, lake)
    assert(CommitLog.recordCount(fs, lake) == 1)
    assert(CommitLog.committedNames(fs, lake) == before)
    // the index tracked every committed file through all of the above
    val idxFiles = StatsIndex.prunedFiles(spark, s"$dir/idx", Nil).size
    val lakeFiles = full.select(input_file_name()).distinct().count()
    assert(idxFiles == lakeFiles, s"index $idxFiles vs lake $lakeFiles")
  }

  test("compactSmall folds only small committed files, exactly-once " +
    "at every crash point, and the index converges") {
    import org.apache.hadoop.fs.Path
    import graft.sources.{CommitLog, ZOrder}
    val dir = Files.createTempDirectory("graft_lcmp_").toString
    val lake = s"$dir/lake"
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkBatch(from: Int, until: Int) = (from until until).map { i =>
      ((i * 7919L) % 4096, (i * 104729L) % 4096, i.toLong)
    }.toDF("x", "y", "payload")
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("x", "y"),
        bits = 10, filesPerBatch = 2, curve = "morton")
    (0 until 6).foreach(b => process(mkBatch(b * 500, (b + 1) * 500), b))
    val filesBefore = CommitLog.dataFileNames(fs, lake).size
    assert(filesBefore == 12) // 6 batches x 2 small files of debt
    // crash BEFORE publish: pure orphans, committed view untouched,
    // re-runnable immediately
    intercept[RuntimeException] {
      ZOrder.compactSmall(spark, lake, Seq("x", "y"),
        minBytes = 1L << 20, bits = 10, failBeforePublish = true)
    }
    assert(LayoutSink.readCommitted(spark, lake).count() == 3000)
    // crash AFTER publish, before the old files are deleted: the
    // committed view already swapped — no duplicate, no loss
    intercept[RuntimeException] {
      ZOrder.compactSmall(spark, lake, Seq("x", "y"),
        minBytes = 1L << 20, bits = 10, failBeforeDelete = true)
    }
    val committedMid = LayoutSink.readCommitted(spark, lake)
    assert(committedMid.count() == 3000)
    assert(committedMid.select($"payload").distinct().count() == 3000)
    // the next sink batch sweeps the now-unreferenced originals and
    // the lake converges; a second compact then sees little debt
    process(mkBatch(3000, 3500), 6)
    val full = spark.read.parquet(lake)
    assert(full.count() == 3500)
    assert(full.select($"payload").distinct().count() == 3500)
    // clean run over the remaining debt (batch 6's files + leftovers)
    val (olds, news) = ZOrder.compactSmall(spark, lake, Seq("x", "y"),
      minBytes = 1L << 20, bits = 10, indexDir = Some(s"$dir/idx"))
    assert(olds >= 2 && news >= 1 && news < olds,
      s"compaction should shrink file count: $olds -> $news")
    val after = spark.read.parquet(lake)
    assert(after.count() == 3500)
    assert(after.select($"payload").distinct().count() == 3500)
    assert(after.agg(sum($"payload")).head.getLong(0) ==
      (0L until 3500).sum)
    assert(LayoutSink.readCommitted(spark, lake).count() == 3500)
    // the refreshed index matches the compacted lake exactly
    val idxFiles = StatsIndex.prunedFiles(spark, s"$dir/idx", Nil).size
    val lakeFiles = after.select(input_file_name()).distinct().count()
    assert(idxFiles == lakeFiles, s"index $idxFiles vs lake $lakeFiles")
    // replay of an already-committed batch after compaction: no-op
    // (the swap checkpoint carries the max batch id)
    process(mkBatch(0, 500), 0)
    assert(spark.read.parquet(lake).count() == 3500)
    // files over the threshold are never rewritten: with a tiny
    // threshold nothing qualifies
    assert(ZOrder.compactSmall(spark, lake, Seq("x", "y"),
      minBytes = 1L) == ((0, 0)))
  }

  test("readCommitted of a logged lake with no data files is empty, " +
    "not a schema-inference error") {
    val dir = Files.createTempDirectory("graft_lemp_").toString
    val lake = s"$dir/lake"
    val empty = Seq.empty[(Long, Long, Long)].toDF("x", "y", "payload")
    LayoutSink.processBatch(empty, 0, lake, s"$dir/idx", Seq("x", "y"),
      bits = 10, filesPerBatch = 2, curve = "morton")
    assert(LayoutSink.readCommitted(spark, lake).count() == 0)
  }

  test("start() rejects a 1-column hilbert layout at configuration " +
    "time, before any batch runs") {
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .parquet(s"$work/in")
    val e = intercept[IllegalArgumentException] {
      LayoutSink.start(stream, s"/tmp/never/lake", s"/tmp/never/idx",
        s"/tmp/never/ckp", Seq("x"), curve = "hilbert")
    }
    assert(e.getMessage.contains("2 clustering columns"))
  }

  test("per-batch z-files still prune a small box") {
    // 16 files (4 batches x 4); a 12%-per-dim box should not need most
    // of them even though z-locality is only batch-level. Threshold is
    // 5/8, not 1/2: ZOrder.write cuts files with repartitionByRange,
    // whose reservoir sampling places boundaries slightly differently
    // per run — the observed hit count sits at 8-or-9 of 16 across
    // runs, and a threshold on the sampler's variance edge flakes
    // without any locality change (one full-suite run in five hit 9).
    val all = StatsIndex.prunedFiles(spark, s"$work/idx", Nil)
    val hit = StatsIndex.prunedFiles(spark, s"$work/idx",
      Seq(("x", 1000L, 1500L), ("y", 1000L, 1500L)))
    assert(all.size >= 12, s"expected >= 12 files, got ${all.size}")
    assert(hit.size <= (all.size * 5) / 8,
      s"box needs ${hit.size}/${all.size} files — batch z-locality lost")
  }
}
