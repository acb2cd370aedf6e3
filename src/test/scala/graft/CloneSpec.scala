package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{Clone, CommitLog, Constraints, DeletionVectors, MergeInto}
import graft.streaming.LayoutSink

/** SHALLOW CLONE (`Clone.shallow`): a zero-copy branch of a committed
  * lake — the clone's log references the source's files; every verb
  * resolves names local-first through the clone-source chain. Pinned
  * here: zero bytes copied, read equality, mutation isolation in BOTH
  * directions, deletion-vector coverage travel, constraint travel,
  * chain resolution, restore reachability, and `materialize`'s
  * independence guarantee. Oracle twin: `q79_clone`. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A committed 3-file lake: 300 rows, `k` unique, `v = 10 * k`. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_cl_").toString + "/lake"
    val f = fs(lake)
    (0 until 300).map(k => (k, 10L * k)).toDF("k", "v")
      .repartition(3).write.parquet(lake)
    CommitLog.commit(f, lake, 0L,
      CommitLog.dataFileNames(f, lake).toSeq.sorted)
    lake
  }

  private def cloneDirFor(lake: String): String =
    new Path(lake).getParent.toString + "/branch"

  test("shallow clone copies zero data bytes and reads equal to the " +
    "source") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    val (nData, nDv) = Clone.shallow(spark, lake, dst)
    assert(nData == 3 && nDv == 0)
    // ZERO data files physically under the clone — metadata only
    assert(CommitLog.dataFileNames(fs(dst), dst).isEmpty)
    assert(Clone.isClone(spark, dst))
    val src = LayoutSink.readCommitted(spark, lake).collect().toSet
    val cln = LayoutSink.readCommitted(spark, dst).collect().toSet
    assert(cln == src && cln.size == 300)
  }

  test("a CoW merge on the clone never touches the source; replaced " +
    "source files stay committed there") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    val srcFilesBefore = CommitLog.dataFileNames(fs(lake), lake)
    val upd = Seq((7, -7L), (999, -999L)).toDF("k", "v")
    val (rewritten, carried) = MergeInto.merge(spark, dst, upd, Seq("k"))
    assert(rewritten == 1 && carried == 2)
    // source: byte-identical file set, same rows
    assert(CommitLog.dataFileNames(fs(lake), lake) == srcFilesBefore)
    val src = LayoutSink.readCommitted(spark, lake)
    assert(src.count() == 300 &&
      src.filter(col("v") < 0).count() == 0)
    // clone: update applied + insert landed; carried rows still served
    // from source-resident files
    val cln = LayoutSink.readCommitted(spark, dst)
    assert(cln.count() == 301)
    assert(cln.filter(col("k") === 7).head.getLong(1) == -7L)
    assert(cln.filter(col("k") === 999).head.getLong(1) == -999L)
    assert(cln.filter(col("k") === 8).head.getLong(1) == 80L)
  }

  test("a source append after the clone is invisible to the clone — " +
    "snapshot semantics") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    val before = CommitLog.dataFileNames(fs(lake), lake)
    Seq((1000, 1L)).toDF("k", "v").coalesce(1).write.mode("append")
      .parquet(lake)
    CommitLog.commit(fs(lake), lake, 1L,
      (CommitLog.dataFileNames(fs(lake), lake) -- before).toSeq.sorted)
    assert(LayoutSink.readCommitted(spark, lake).count() == 301)
    assert(LayoutSink.readCommitted(spark, dst).count() == 300)
  }

  test("MoR verbs on the clone write sidecars locally; coverage of a " +
    "DV'd source travels into the clone") {
    val lake = mkLake()
    // DV-delete on the SOURCE first, then clone: coverage must travel
    assert(DeletionVectors.deleteMor(spark, lake, "k % 3 = 0") == 100)
    val dst = cloneDirFor(lake)
    val (nData, nDv) = Clone.shallow(spark, lake, dst)
    assert(nData == 3 && nDv == 1)
    assert(DeletionVectors.readMor(spark, dst).count() == 200)
    // a further MoR delete on the CLONE: sidecar lands under the clone,
    // the source's live view is untouched
    assert(DeletionVectors.deleteMor(spark, dst, "k % 3 = 1") == 100)
    assert(DeletionVectors.readMor(spark, dst).count() == 100)
    assert(DeletionVectors.readMor(spark, lake).count() == 200)
    val dvd = new Path(DeletionVectors.dvDir(dst))
    assert(fs(dst).listStatus(dvd).count(
      _.getPath.getName.endsWith(".parquet")) == 1)
  }

  test("CHECK constraints travel at clone time, then evolve " +
    "independently") {
    val lake = mkLake()
    Constraints.add(spark, lake, "v_nonneg", "v >= 0")
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    // the inherited constraint gates the clone's writes
    val bad = Seq((7, -7L), (999, -999L)).toDF("k", "v")
    intercept[Constraints.ConstraintViolation] {
      MergeInto.merge(spark, dst, bad, Seq("k"))
    }
    assert(LayoutSink.readCommitted(spark, dst).count() == 300)
    // dropping it on the clone does not drop it on the source
    Constraints.drop(spark, dst, "v_nonneg")
    MergeInto.merge(spark, dst, bad, Seq("k"))
    assert(LayoutSink.readCommitted(spark, dst)
      .filter(col("v") < 0).count() == 2)
    intercept[Constraints.ConstraintViolation] {
      MergeInto.merge(spark, lake, bad, Seq("k"))
    }
  }

  test("clone of a clone resolves through the chain") {
    val lake = mkLake()
    val mid = cloneDirFor(lake)
    Clone.shallow(spark, lake, mid)
    MergeInto.merge(spark, mid, Seq((7, -7L)).toDF("k", "v"), Seq("k"))
    val leaf = new Path(lake).getParent.toString + "/leaf"
    Clone.shallow(spark, mid, leaf)
    val got = LayoutSink.readCommitted(spark, leaf)
    assert(got.count() == 300)
    assert(got.filter(col("k") === 7).head.getLong(1) == -7L)
    assert(got.filter(col("k") === 8).head.getLong(1) == 80L)
  }

  test("CLONE VERSION AS OF: branch a time-travel snapshot — later " +
    "batches invisible, guards inherited from committedNamesAt") {
    val dir = Files.createTempDirectory("graft_cl_asof_").toString
    val lake = s"$dir/lake"
    val f = fs(lake)
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(i => (b, b * 1000L + i)).toDF("b", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    val snap = s"$dir/snap"
    val (n, nDv) = Clone.shallow(spark, lake, snap, asOf = Some(1L))
    assert(n == 2 && nDv == 0)
    val got = LayoutSink.readCommitted(spark, snap)
    assert(got.count() == 200)
    assert(got.agg(max(col("b"))).head.getInt(0) == 1)
    // the branch is a full table: mutate it, source stays 300 rows
    MergeInto.merge(spark, snap, Seq((9, -9L)).toDF("b", "v"), Seq("b"))
    assert(LayoutSink.readCommitted(spark, lake).count() == 300)
    // a CoW mutation on the source REWRITES the files and its
    // horizon-0 vacuum reclaims the originals — the r10 versioned log
    // resolves the pre-mutation view fine (the records are live), but
    // the BYTES are gone, so the clone arm fails loudly naming them
    MergeInto.delete(spark, lake, "v % 10 = 3")
    val e = intercept[IllegalArgumentException] {
      Clone.shallow(spark, lake, s"$dir/snap2", asOf = Some(1L))
    }
    assert(e.getMessage.contains("reclaimed"), e.getMessage)
  }

  test("a chained clone keeps resolving after the MIDDLE lake " +
    "materializes — and after the ROOT then disappears") {
    val lake = mkLake()
    val mid = cloneDirFor(lake)
    Clone.shallow(spark, lake, mid)
    val leaf = new Path(lake).getParent.toString + "/leaf"
    Clone.shallow(spark, mid, leaf)
    // mid localizes every referenced byte; leaf's chain now finds the
    // names physically in mid (local-wins at the mid hop)
    Clone.materialize(spark, mid)
    assert(!Clone.isClone(spark, mid) && Clone.isClone(spark, leaf))
    fs(lake).delete(new Path(lake), true)
    val got = LayoutSink.readCommitted(spark, leaf)
    assert(got.count() == 300)
    assert(got.filter(col("k") === 8).head.getLong(1) == 80L)
    // leaf can still materialize from the mid hop and detach fully
    assert(Clone.materialize(spark, leaf)._1 == 3)
    fs(mid).delete(new Path(mid), true)
    assert(LayoutSink.readCommitted(spark, leaf).count() == 300)
  }

  test("restore on the clone rolls back an append to the merge's " +
    "mutation id; source-resident carried files pass the " +
    "reclaimed-bytes check") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    // merge on the bootstrap-only clone publishes its mutation
    // checkpoint at the bootstrap id -1 (the clamp every verb uses);
    // restore to -1 therefore targets the view AS PUBLISHED there —
    // post-merge (restore's exact-mutation-checkpoint arm), with two
    // of its three files still source-resident
    MergeInto.merge(spark, dst,
      Seq((7, -7L), (999, -999L)).toDF("k", "v"), Seq("k"))
    val before = CommitLog.dataFileNames(fs(dst), dst)
    Seq((5000, 1L)).toDF("k", "v").coalesce(1).write.mode("append")
      .parquet(dst)
    CommitLog.commit(fs(dst), dst, 0L,
      (CommitLog.dataFileNames(fs(dst), dst) -- before).toSeq.sorted)
    assert(LayoutSink.readCommitted(spark, dst).count() == 302)
    CommitLog.restore(fs(dst), dst, toBatchId = -1L)
    val got = LayoutSink.readCommitted(spark, dst)
    assert(got.count() == 301)
    assert(got.filter(col("v") < 0).count() == 2)
    assert(got.filter(col("k") === 5000).isEmpty)
    // the source is untouched by all of it
    assert(LayoutSink.readCommitted(spark, lake).count() == 300)
  }

  test("materialize localizes every referenced byte and retires the " +
    "pointer — the source can disappear afterwards") {
    val lake = mkLake()
    assert(DeletionVectors.deleteMor(spark, lake, "k % 3 = 0") == 100)
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    // clone-local churn first: one file rewritten locally via compact
    // would drop vectors; use a MoR update to keep both kinds of
    // source-resident bytes (data + sidecar) in play
    assert(DeletionVectors.updateMor(spark, dst, "k = 1",
      Map("v" -> "v + 5")) == 1L)
    val expect = DeletionVectors.readMor(spark, dst).collect().toSet
    val (nData, nDv) = Clone.materialize(spark, dst)
    assert(nData == 3 && nDv >= 1)
    assert(!Clone.isClone(spark, dst))
    // physically delete the source lake — the clone must not notice
    fs(lake).delete(new Path(lake), true)
    assert(DeletionVectors.readMor(spark, dst).collect().toSet == expect)
    // idempotent: a second materialize has nothing to copy
    assert(Clone.materialize(spark, dst) == (0, 0))
  }

  test("fail-fasts: uncommitted source, occupied target, self-clone") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    val plain = Files.createTempDirectory("graft_cl_plain_").toString
    intercept[IllegalArgumentException] {
      Clone.shallow(spark, plain, dst) // no commit log
    }
    intercept[IllegalArgumentException] {
      Clone.shallow(spark, lake, lake) // self
    }
    Clone.shallow(spark, lake, dst)
    intercept[IllegalArgumentException] {
      Clone.shallow(spark, lake, dst) // already a lake
    }
  }

  test("readMorStream over a shallow clone (r10): one pinned file " +
    "stream per chain hop — source-resident carried files, the " +
    "branch's own churn and its vectors all serve; source-side moves " +
    "after construction stay invisible") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    // branch churn: a MoR delete (sidecar under the branch) + a CoW
    // merge whose rewrite lands locally while 2 files stay carried
    DeletionVectors.deleteMor(spark, dst, "k % 10 = 3")
    DeletionVectors.mergeMor(spark, dst,
      Seq((9000, -1L)).toDF("k", "v"), Seq("k"))
    val want = DeletionVectors.readMor(spark, dst)
      .orderBy("k").select("k").as[Int].collect().toSeq
    val stream = DeletionVectors.readMorStream(spark, dst,
      maxFilesPerTrigger = 2)
    // AFTER construction: source append + branch append — both
    // excluded by the pinned name sets
    val f = fs(lake)
    Seq((7777, 1L)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(lake)
    CommitLog.commit(f, lake, 1L, (CommitLog.dataFileNames(f, lake) --
      CommitLog.committedNames(f, lake)).toSeq.sorted)
    Seq((8888, 2L)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(dst)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("clone_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("clone_stream")
      .orderBy("k").select("k").as[Int].collect().toSeq
    assert(got == want,
      s"clone stream drifted: ${got.size} vs ${want.size} rows")
    assert(got.size == 271 && got.contains(9000)) // 300 - 30 + insert
  }

  test("a crashed half-clone (pointer, no records) reads LOUDLY and " +
    "a re-run of shallow self-heals it; stale _dv debris in the " +
    "target is rejected") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    // simulate the crash window: log dir + pointer, no bootstrap
    val f = fs(dst)
    f.mkdirs(new Path(CommitLog.logDir(dst)))
    val out = f.create(new Path(CommitLog.logDir(dst), "_clone_source"),
      true)
    out.write(lake.getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException] {
      LayoutSink.readCommitted(spark, dst)
    }
    assert(e.getMessage.contains("half-created clone"))
    // the as-of and CDC readers fail the same way (they would
    // otherwise serve a silent empty frame for the record-less log)
    intercept[IllegalArgumentException] {
      LayoutSink.readCommittedAt(spark, dst, asOf = 0L)
    }
    intercept[IllegalArgumentException] {
      LayoutSink.readChanges(spark, dst, 0L, 1L)
    }
    // retry self-heals: sweeps the debris and completes
    Clone.shallow(spark, lake, dst)
    assert(LayoutSink.readCommitted(spark, dst).count() == 300)
    // a target with stale _dv sidecar debris is rejected outright —
    // local-wins resolution would shadow same-named source sidecars
    val dst2 = new Path(lake).getParent.toString + "/branch2"
    f.mkdirs(new Path(DeletionVectors.dvDir(dst2)))
    val o2 = f.create(
      new Path(DeletionVectors.dvDir(dst2), "stale.parquet"), true)
    o2.write(Array[Byte](1)); o2.close()
    val e2 = intercept[IllegalArgumentException] {
      Clone.shallow(spark, lake, dst2)
    }
    assert(e2.getMessage.contains("_dv sidecar"))
  }

  test("materialize localizes every LIVE-record-referenced file, so " +
    "restore to an exact earlier mutation id survives the source's " +
    "deletion") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    // mutation at the bootstrap id -1: replaces the file holding k=7
    MergeInto.merge(spark, dst, Seq((7, -7L)).toDF("k", "v"), Seq("k"))
    // an append moves the max id to 0...
    val before = CommitLog.dataFileNames(fs(dst), dst)
    Seq((5000, 1L)).toDF("k", "v").coalesce(1).write.mode("append")
      .parquet(dst)
    CommitLog.commit(fs(dst), dst, 0L,
      (CommitLog.dataFileNames(fs(dst), dst) -- before).toSeq.sorted)
    // ...so this merge publishes at 0 and replaces ANOTHER source
    // file — which thereby leaves the CURRENT view while staying
    // referenced by the still-restorable exact checkpoint at -1
    MergeInto.merge(spark, dst, Seq((8, -8L)).toDF("k", "v"), Seq("k"))
    Clone.materialize(spark, dst)
    fs(lake).delete(new Path(lake), true)
    // restore to the -1 mutation: its source-resident files must have
    // been localized even though the current view no longer lists them
    CommitLog.restore(fs(dst), dst, toBatchId = -1L)
    val got = LayoutSink.readCommitted(spark, dst)
    assert(got.count() == 300)
    assert(got.filter(col("k") === 7).head.getLong(1) == -7L)
    assert(got.filter(col("k") === 8).head.getLong(1) == 80L)
    assert(got.filter(col("k") === 5000).isEmpty)
  }

  test("vacuum on the clone sweeps only clone-local orphans; source " +
    "bytes are never its debris") {
    val lake = mkLake()
    val dst = cloneDirFor(lake)
    Clone.shallow(spark, lake, dst)
    // an uncommitted orphan in the CLONE dir
    Seq((1, 1L)).toDF("k", "v").coalesce(1).write.mode("append")
      .parquet(dst)
    val swept = CommitLog.vacuum(fs(dst), dst, olderThanMs = 0L)
    assert(swept.size == 1)
    assert(LayoutSink.readCommitted(spark, lake).count() == 300)
    assert(LayoutSink.readCommitted(spark, dst).count() == 300)
  }

  test("stats-index travel (r10): adoptClone gives a fresh branch the " +
    "source's pruning — same file count touched — and branch DML " +
    "un-currents it until refresh") {
    import graft.sources.StatsIndex
    val dir = Files.createTempDirectory("graft_cl_idx_").toString
    val lake = s"$dir/lake"
    val f = fs(lake)
    (0 until 300).map(k => (k, 10L * k)).toDF("k", "v")
      .repartitionByRange(4, col("k")).sortWithinPartitions(col("k"))
      .write.parquet(lake)
    CommitLog.commit(f, lake, 0L,
      CommitLog.dataFileNames(f, lake).toSeq.sorted)
    StatsIndex.build(spark, lake, Seq("k"), s"$dir/srcIdx")
    val branch = s"$dir/branch"
    Clone.shallow(spark, lake, branch)
    // adoption is metadata-only and validated against the clone's view
    assert(StatsIndex.adoptClone(spark, branch,
      s"$dir/srcIdx", s"$dir/brIdx") == 4)
    val ranges = Seq(StatsIndex.LongRange("k", 10L, 60L))
    val srcTouch = StatsIndex.prunedTyped(spark, s"$dir/srcIdx", ranges)
    val brTouch = StatsIndex.prunedTyped(spark, s"$dir/brIdx", ranges)
    assert(srcTouch.size == brTouch.size && srcTouch.nonEmpty,
      s"branch pruned ${brTouch.size} files, source ${srcTouch.size}")
    // the pruned MoR read serves identical rows through the chain
    val got = DeletionVectors.readMorPruned(spark, branch,
      s"$dir/brIdx", ranges).orderBy("k").collect().toSeq
    val want = DeletionVectors.readMorPruned(spark, lake,
      s"$dir/srcIdx", ranges).orderBy("k").collect().toSeq
    assert(got == want && got.size == 51)
    // a SOURCE append + source-index refresh cannot un-current the
    // branch's COPY: the branch's committed view is pinned, its index
    // generation is its own
    Seq((9999, 1L)).toDF("k", "v").coalesce(1).write.mode("append")
      .parquet(lake)
    CommitLog.commit(f, lake, 1L, (CommitLog.dataFileNames(f, lake) --
      StatsIndex.indexedFiles(spark, s"$dir/srcIdx")
        .map(pp => new Path(pp).getName).toSet).toSeq.sorted)
    StatsIndex.refreshSameColumns(spark, lake, s"$dir/srcIdx")
    assert(StatsIndex.indexedFiles(spark, s"$dir/srcIdx").size == 5)
    assert(StatsIndex.indexedFiles(spark, s"$dir/brIdx").size == 4)
    assert(DeletionVectors.readMorPruned(spark, branch,
      s"$dir/brIdx", ranges).count() == 51)
    // BRANCH DML un-currents the adopted index: the pruned read
    // falls back to the full committed scan — correct, not accelerated
    DeletionVectors.mergeMor(spark, branch,
      Seq((20, -20L)).toDF("k", "v"), Seq("k"))
    val committedNow = CommitLog.committedNames(f, branch)
    assert(StatsIndex.indexedFiles(spark, s"$dir/brIdx")
      .map(pp => new Path(pp).getName).toSet != committedNow,
      "branch DML must leave the adopted index stale")
    val after = DeletionVectors.readMorPruned(spark, branch,
      s"$dir/brIdx", ranges)
    assert(after.count() == 51)
    assert(after.filter(col("k") === 20).select("v")
      .as[Long].head() == -20L)
    // adopting into a diverged branch fails fast
    val e = intercept[IllegalArgumentException] {
      StatsIndex.adoptClone(spark, branch, s"$dir/srcIdx", s"$dir/x")
    }
    assert(e.getMessage.contains("different file set"), e.getMessage)
  }
}
