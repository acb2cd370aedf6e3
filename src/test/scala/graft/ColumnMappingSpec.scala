package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{Clone, ColumnMapping, CommitLog, Constraints, DeletionVectors, GeneratedColumns, Occ, ZOrder}
import graft.streaming.LayoutSink

/** Column mapping ([[graft.sources.ColumnMapping]]): RENAME/DROP are
  * metadata-only record publishes — zero data I/O — that every
  * committed read resolves and every mapped write inverts. Oracle
  * twin: `q84_column_mapping`; here the arms SQL can't express:
  * byte-level no-rewrite proof, rename-back identity, stale/resurrect
  * rejection, travel/clone/OPTIMIZE metadata carry. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Lake with one committed batch: (k, v, extra), k unique 0..99. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_cmap_").toString + "/lake"
    assert(Occ.append(spark,
      lake, (0 until 100).map(k => (k, 2L * k, s"x$k"))
        .toDF("k", "v", "extra")) >= 0L)
    lake
  }

  private def dataState(lake: String): Seq[(String, Long, Long)] = {
    val f = fs(lake)
    CommitLog.dataFileNames(f, lake).toSeq.sorted.map { n =>
      val st = f.getFileStatus(new Path(lake, n))
      (n, st.getLen, st.getModificationTime)
    }
  }

  test("RENAME and DROP are zero data I/O: no file is added, removed, " +
    "resized or rewritten") {
    val lake = mkLake()
    val before = dataState(lake)
    ColumnMapping.rename(spark, lake, "v", "value")
    ColumnMapping.drop(spark, lake, "extra")
    assert(dataState(lake) == before,
      "a metadata-only rename/drop must not touch a single data byte")
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.columns.toSeq == Seq("k", "value"))
    assert(got.agg(sum($"value")).head.getLong(0) ==
      (0 until 100).map(2L * _).sum)
  }

  test("files appended before and after a rename share one physical " +
    "schema and read as one logical one — through readCommitted AND " +
    "the MoR surface") {
    val lake = mkLake()
    ColumnMapping.rename(spark, lake, "v", "value")
    // the write path projects the new logical name back to the
    // committed physical one — no mergeSchema divergence
    assert(Occ.append(spark, lake,
      (100 until 150).map(k => (k, 3L * k, s"x$k"))
        .toDF("k", "value", "extra")) > 0L)
    val phys = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(phys.columns.contains("v") && !phys.columns.contains("value"),
      "on disk there must be exactly ONE physical name")
    val got = LayoutSink.readCommitted(spark, lake, mergeSchema = true)
    assert(got.columns.toSeq.sorted == Seq("extra", "k", "value"))
    assert(got.count() == 150L)
    // MoR read surface applies the map too (and a delete composes)
    assert(DeletionVectors.deleteMor(spark, lake, "k < 10") == 10L)
    val mor = DeletionVectors.readMor(spark, lake, mergeSchema = true)
    assert(mor.count() == 140L)
    assert(mor.filter($"value" === 3L * 120).count() == 1L)
  }

  test("rename BACK to the physical name restores identity: the map " +
    "entry disappears instead of accreting") {
    val lake = mkLake()
    ColumnMapping.rename(spark, lake, "v", "value")
    ColumnMapping.rename(spark, lake, "value", "v")
    assert(ColumnMapping.mapping(fs(lake), lake).renames.isEmpty)
    assert(LayoutSink.readCommitted(spark, lake).columns
      .contains("v"))
  }

  test("rejections are loud: occupied target, missing source, stale " +
    "physical producer, resurrect-after-drop") {
    val lake = mkLake()
    intercept[IllegalArgumentException] {
      ColumnMapping.rename(spark, lake, "v", "k") // taken
    }
    intercept[IllegalArgumentException] {
      ColumnMapping.rename(spark, lake, "nope", "v2") // missing
    }
    ColumnMapping.rename(spark, lake, "v", "value")
    // a producer still writing the PRE-rename name is stale, not
    // silently accepted under the old physical
    val stale = intercept[IllegalArgumentException] {
      Occ.append(spark, lake, Seq((900, 1L, "x")).toDF("k", "v", "extra"))
    }
    assert(stale.getMessage.contains("RENAMED"), stale.getMessage)
    ColumnMapping.drop(spark, lake, "extra")
    // recreating a dropped column would resurrect its dead bytes
    val res = intercept[IllegalArgumentException] {
      Occ.append(spark, lake,
        Seq((901, 1L, "x")).toDF("k", "value", "extra"))
    }
    assert(res.getMessage.contains("DROPPED"), res.getMessage)
    // nothing above published anything
    assert(LayoutSink.readCommitted(spark, lake).count() == 100L)
  }

  test("time travel applies the CURRENT map to every version (the map " +
    "is table metadata, not versioned state)") {
    val lake = mkLake()
    assert(Occ.append(spark, lake,
      (100 until 120).map(k => (k, 9L, s"x$k"))
        .toDF("k", "v", "extra")) > 0L)
    ColumnMapping.rename(spark, lake, "v", "value")
    ColumnMapping.drop(spark, lake, "extra")
    val at0 = LayoutSink.readCommittedAt(spark, lake, asOf = 0L)
    assert(at0.columns.toSeq == Seq("k", "value"))
    assert(at0.count() == 100L)
  }

  test("every write path speaks LOGICAL names across a rename: sink " +
    "ingest (clustering columns included), CoW merge and MoR merge " +
    "keys/frames all land the shared physical schema") {
    val dir = Files.createTempDirectory("graft_cmap_wp_").toString
    val lake = s"$dir/lake"
    // batch 0 under the original names
    LayoutSink.processBatch(
      (0 until 100).map(k => (k.toLong, 2L * k)).toDF("k", "v"),
      batchId = 0L, lake, s"$dir/idx", Seq("k"), bits = 8,
      filesPerBatch = 1, curve = "morton")
    ColumnMapping.rename(spark, lake, "k", "id")
    ColumnMapping.rename(spark, lake, "v", "value")
    // batch 1 arrives under the NEW logical names — including the
    // clustering column the sink z-orders by
    LayoutSink.processBatch(
      (100 until 150).map(k => (k.toLong, 3L * k)).toDF("id", "value"),
      batchId = 1L, lake, s"$dir/idx", Seq("id"), bits = 8,
      filesPerBatch = 1, curve = "morton")
    val phys = spark.read.parquet(lake)
    assert(phys.columns.sorted.toSeq == Seq("k", "v"),
      s"one physical schema on disk, saw ${phys.columns.mkString(",")}")
    assert(LayoutSink.readCommitted(spark, lake).count() == 150L)
    // MoR merge: logical key name, logical frame columns
    val (m1, a1) = DeletionVectors.mergeMor(spark, lake,
      Seq((0L, -1L), (900L, -9L)).toDF("id", "value"), Seq("id"))
    assert(m1 == 1L && a1 == 2L)
    val mor = DeletionVectors.readMor(spark, lake)
    assert(mor.filter($"id" === 0L).select($"value").head.getLong(0)
      == -1L)
    assert(mor.filter($"id" === 900L).count() == 1L)
    // CoW merge on a vector-free lake: compact first, then merge with
    // logical names
    DeletionVectors.compact(spark, lake)
    val (rw, _) = graft.sources.MergeInto.merge(spark, lake,
      Seq((1L, -2L)).toDF("id", "value"), Seq("id"))
    assert(rw >= 1)
    val got = LayoutSink.readCommitted(spark, lake, mergeSchema = true)
    assert(got.filter($"id" === 1L).select($"value").head.getLong(0)
      == -2L)
    assert(got.count() == 151L) // 150 + one net insert (id 900)
  }

  test("definitions resolve in LOGICAL-name space across a rename: a " +
    "CHECK constraint on the NEW name is ENFORCED at the write gate " +
    "(files carry the physical name), and a referenced column cannot " +
    "be renamed or dropped away from under a live definition") {
    val lake = mkLake()
    ColumnMapping.rename(spark, lake, "v", "value")
    // definition under the post-rename logical name: add validates
    // against the mapped live view, and the write-side gate must
    // evaluate in the same space — before the toLogical projection in
    // validatePaths this predicate hit AnalysisException on the
    // physical files and silently stopped gating
    Constraints.add(spark, lake, "pos_value", "value >= 0")
    val bad = intercept[Constraints.ConstraintViolation] {
      Occ.append(spark, lake,
        Seq((990, -5L, "x")).toDF("k", "value", "extra"))
    }
    assert(bad.name == "pos_value")
    assert(LayoutSink.readCommitted(spark, lake).count() == 100L,
      "the rejected batch must not have published")
    assert(Occ.append(spark, lake,
      Seq((991, 5L, "x991")).toDF("k", "value", "extra")) > 0L)
    // renaming or dropping the referenced column would orphan the
    // definition (the gate would stop resolving and pass everything) —
    // rejected loudly, Delta's behavior
    val r = intercept[IllegalArgumentException] {
      ColumnMapping.rename(spark, lake, "value", "v2")
    }
    assert(r.getMessage.contains("pos_value"), r.getMessage)
    intercept[IllegalArgumentException] {
      ColumnMapping.drop(spark, lake, "value")
    }
    // dropping the DEFINITION re-frees the column
    Constraints.drop(spark, lake, "pos_value")
    ColumnMapping.rename(spark, lake, "value", "v2")
    // generated columns: same space, same guard — definition over the
    // renamed dependency enforces on appends and pins both columns
    GeneratedColumns.add(spark, lake, "extra", "concat('x', k)")
    val gbad = intercept[GeneratedColumns.GeneratedColumnViolation] {
      Occ.append(spark, lake,
        Seq((992, 7L, "WRONG")).toDF("k", "v2", "extra"))
    }
    assert(gbad.column == "extra")
    intercept[IllegalArgumentException] { // the generated column itself
      ColumnMapping.rename(spark, lake, "extra", "tag")
    }
    intercept[IllegalArgumentException] { // its dependency
      ColumnMapping.drop(spark, lake, "k")
    }
  }

  test("the map survives OPTIMIZE's dir swap and replicates into a " +
    "shallow clone (evolving independently after)") {
    val lake = mkLake()
    ColumnMapping.rename(spark, lake, "v", "value")
    ColumnMapping.drop(spark, lake, "extra")
    ZOrder.optimize(spark, lake, Seq("k"), bits = 8, numFiles = 2)
    val post = LayoutSink.readCommitted(spark, lake)
    assert(post.columns.toSeq.sorted == Seq("k", "value"),
      s"post-OPTIMIZE columns: ${post.columns.mkString(", ")}")
    assert(post.count() == 100L)
    val cloneDir = Files.createTempDirectory("graft_cmap_cl_")
      .toString + "/clone"
    Clone.shallow(spark, lake, cloneDir)
    val cl = LayoutSink.readCommitted(spark, cloneDir)
    assert(cl.columns.toSeq.sorted == Seq("k", "value"))
    assert(cl.count() == 100L)
    // clone-side evolution does not leak back to the source
    ColumnMapping.rename(spark, cloneDir, "value", "val2")
    assert(LayoutSink.readCommitted(spark, lake).columns
      .contains("value"))
  }

  // ---- REORG … APPLY (PURGE) ----------------------------------------

  test("PURGE reclaims the dropped bytes, keeps renames, lifts the " +
    "tombstone, and a second purge is a no-op") {
    val lake = mkLake()
    ColumnMapping.rename(spark, lake, "v", "value")
    ColumnMapping.drop(spark, lake, "extra")
    val viewBefore = LayoutSink.readCommitted(spark, lake)
      .collect().toSet
    val (rewritten, carried) = ColumnMapping.purge(spark, lake)
    assert(rewritten > 0 && carried == 0,
      s"every file carried 'extra': ($rewritten, $carried)")
    // the bytes are physically gone: no footer advertises the column
    val phys = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(!phys.columns.contains("extra"),
      s"physical columns after purge: ${phys.columns.mkString(", ")}")
    // the rename survives (purge lifts TOMBSTONES, not the map)
    val m = ColumnMapping.mapping(fs(lake), lake)
    assert(m.dropped.isEmpty && m.renames == Seq(("value", "v")))
    assert(LayoutSink.readCommitted(spark, lake).collect().toSet
      == viewBefore, "purge must not move a live row or value")
    // idempotent: no tombstones left, nothing rewrites
    val state = dataState(lake)
    assert(ColumnMapping.purge(spark, lake) == (0, state.size))
    assert(dataState(lake) == state,
      "a tombstone-free purge must not touch a data byte")
  }

  test("PURGE rewrites ONLY carrying files — a post-drop append's " +
    "clean file is carried by name with zero I/O") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    // this batch is born clean (toPhysical cannot even carry 'extra')
    assert(Occ.append(spark, lake,
      (100 until 120).map(k => (k, 5L * k)).toDF("k", "v")) > 0L)
    val cleanBefore = dataState(lake).filter { case (n, _, _) =>
      !spark.read.parquet(s"$lake/$n").columns.contains("extra")
    }
    assert(cleanBefore.nonEmpty)
    val (rewritten, carried) = ColumnMapping.purge(spark, lake)
    assert(carried == cleanBefore.size,
      s"clean files must carry: rewrote $rewritten, carried $carried")
    val after = dataState(lake)
    cleanBefore.foreach { st =>
      assert(after.contains(st),
        s"clean file ${st._1} must survive purge byte-identically")
    }
    assert(LayoutSink.readCommitted(spark, lake, mergeSchema = true)
      .count() == 120L)
  }

  test("PURGE folds the carrying files' deletion vectors and re-covers " +
    "the clean files' survivors — dead rows stay dead") {
    val lake = mkLake() // batch 0 carries 'extra'
    ColumnMapping.drop(spark, lake, "extra")
    assert(Occ.append(spark, lake,
      (100 until 120).map(k => (k, 5L * k)).toDF("k", "v")) > 0L)
    // one delete spanning a carrying file (k<5) and the clean one (110)
    assert(DeletionVectors.deleteMor(spark, lake,
      "k < 5 OR k = 110") == 6L)
    val before = DeletionVectors.readMor(spark, lake, mergeSchema = true)
      .collect().toSet
    val (rewritten, carried) = ColumnMapping.purge(spark, lake)
    assert(rewritten > 0 && carried > 0)
    val after = DeletionVectors.readMor(spark, lake, mergeSchema = true)
    assert(after.collect().toSet == before,
      "purge must preserve the live view exactly")
    assert(after.filter($"k" === 110 || $"k" < 5).count() == 0L,
      "a deleted row must never resurrect through a purge rewrite")
  }

  test("recreate-after-drop: rejected before PURGE, an ordinary " +
    "additively-evolved column after it") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    intercept[IllegalArgumentException] {
      Occ.append(spark, lake, Seq((200, 1L, "y")).toDF("k", "v", "extra"))
    }
    assert(ColumnMapping.purge(spark, lake)._1 > 0)
    assert(Occ.append(spark, lake,
      Seq((200, 1L, "reborn")).toDF("k", "v", "extra")) > 0L)
    val got = LayoutSink.readCommitted(spark, lake, mergeSchema = true)
    assert(got.filter($"extra" === "reborn").count() == 1L)
    assert(got.filter($"extra".isNull).count() == 100L,
      "pre-purge rows read the recreated column as NULL — additive " +
        "evolution semantics, never resurrected bytes")
  }

  test("PURGE on a shallow CLONE: carrying source-resident files " +
    "rewrite INTO the clone, the source stays byte-identical and " +
    "keeps its column") {
    val lake = mkLake()
    val cloneDir = Files.createTempDirectory("graft_cmap_pcl_")
      .toString + "/clone"
    Clone.shallow(spark, lake, cloneDir)
    val srcState = dataState(lake)
    ColumnMapping.drop(spark, cloneDir, "extra")
    val viewBefore = LayoutSink.readCommitted(spark, cloneDir)
      .collect().toSet
    val (rewritten, _) = ColumnMapping.purge(spark, cloneDir)
    assert(rewritten > 0)
    assert(dataState(lake) == srcState,
      "purging a clone must not touch one source byte")
    assert(LayoutSink.readCommitted(spark, lake).columns
      .contains("extra"), "the source keeps its column")
    assert(LayoutSink.readCommitted(spark, cloneDir).collect().toSet
      == viewBefore, "the clone's view must be preserved")
    assert(!spark.read.option("mergeSchema", "true")
      .parquet(cloneDir).columns.contains("extra"),
      "the clone's replacement files must not carry the column")
  }

  test("PURGE property net: random lakes (batch counts, clean " +
    "appends, DV patterns) — view preserved, bytes gone, accounting " +
    "exact, second purge a no-op") {
    for (seed <- Seq(11, 402)) {
      val rnd = new scala.util.Random(seed)
      val lake = Files.createTempDirectory(s"graft_cmap_net$seed")
        .toString + "/lake"
      val nCarry = 1 + rnd.nextInt(3)
      (0 until nCarry).foreach { b =>
        assert(Occ.append(spark, lake,
          (0 until 50 + rnd.nextInt(100))
            .map(i => (b * 10000 + i, 2L * i, s"x$i"))
            .toDF("k", "v", "extra"), numFiles = 1 + rnd.nextInt(2)) >= 0L)
      }
      ColumnMapping.drop(spark, lake, "extra")
      val nClean = rnd.nextInt(3)
      (0 until nClean).foreach { b =>
        assert(Occ.append(spark, lake,
          (0 until 30).map(i => (90000 + b * 1000 + i, 5L * i))
            .toDF("k", "v"), numFiles = 1) > 0L)
      }
      if (rnd.nextBoolean())
        DeletionVectors.deleteMor(spark, lake,
          s"k % ${2 + rnd.nextInt(5)} = 1"): Unit
      val before = DeletionVectors
        .readMor(spark, lake, mergeSchema = true)
        .select($"k", $"v").collect().toSet
      val f = fs(lake)
      val committedN = CommitLog.committedNames(f, lake).size
      val carryFiles = CommitLog.committedNames(f, lake).count { n =>
        spark.read.parquet(s"$lake/$n").columns.contains("extra")
      }
      val (rewritten, carried) = ColumnMapping.purge(spark, lake)
      assert(rewritten == carryFiles && carried == committedN - carryFiles,
        s"seed $seed: ($rewritten, $carried) vs " +
          s"($carryFiles carrying of $committedN committed)")
      val after = DeletionVectors
        .readMor(spark, lake, mergeSchema = true)
        .select($"k", $"v").collect().toSet
      assert(after == before, s"seed $seed: view drifted through purge")
      assert(!spark.read.option("mergeSchema", "true")
        .parquet(CommitLog.resolveDataPaths(f, lake,
          CommitLog.committedNames(f, lake).toSeq.sorted): _*)
        .columns.contains("extra"), s"seed $seed: bytes survived")
      val state = dataState(lake)
      assert(ColumnMapping.purge(spark, lake) == ((0, state.size)),
        s"seed $seed: second purge must be a no-op")
      assert(dataState(lake) == state,
        s"seed $seed: the no-op purge must not touch a byte")
    }
  }

  test("a change-data-feed cursor flows THROUGH a purge (row-" +
    "preserving empty stamp), and the purge publishes one mutation " +
    "version") {
    import graft.sources.ChangeDataFeed
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    ChangeDataFeed.enable(spark, lake)
    val v0 = ChangeDataFeed.currentVersion(spark, lake)
    assert(DeletionVectors.deleteMor(spark, lake, "k = 7") == 1L)
    assert(ColumnMapping.purge(spark, lake)._1 > 0)
    assert(Occ.append(spark, lake,
      Seq((300, 1L)).toDF("k", "v")) > 0L)
    val feed = ChangeDataFeed.read(spark, lake, v0,
      ChangeDataFeed.currentVersion(spark, lake))
    val byType = feed.groupBy($"_change_type").count().as[(String, Long)]
      .collect().toMap
    assert(byType == Map("delete" -> 1L, "insert" -> 1L),
      s"the purge contributes NO feed rows (empty stamp): $byType")
  }


  test("PURGE is a first-class mutation in the history surface: " +
    "as-of reads below it fail LOUDLY naming the reclaimed bytes, " +
    "history shows its add/rm churn, and purge(indexDir) keeps the " +
    "skipping index current") {
    import graft.sources.{CommitLog, StatsIndex}
    import graft.streaming.LayoutSink
    val lake = mkLake()
    val idx = lake.stripSuffix("/lake") + "/idx"
    StatsIndex.build(spark, lake, Seq("k"), idx)
    ColumnMapping.drop(spark, lake, "extra")
    val f = fs(lake)
    val maxId = CommitLog.maxCommittedId(f, lake)
    val (rewritten, _) = ColumnMapping.purge(spark, lake,
      indexDir = Some(idx))
    assert(rewritten > 0)
    // the bare-id pinner refuses the rewritten id outright (pre/post
    // ambiguity), and addressing the pre-purge manifest record
    // explicitly fails fast naming the RECLAIMED bytes — the same
    // two-tier contract as every physical rewrite
    val amb = intercept[IllegalArgumentException] {
      LayoutSink.readCommittedAt(spark, lake, maxId).collect()
    }
    assert(amb.getMessage.contains("rewrote this id"), amb.getMessage)
    val pre = CommitLog.history(f, lake)
      .find(r => r.id == maxId && r.kind == "manifest").get
    val e = intercept[IllegalArgumentException] {
      CommitLog.viewOfVersion(f, lake, pre)
    }
    assert(e.getMessage.contains("reclaimed"), e.getMessage)
    // history surfaces the purge's churn as add:/rm: deltas
    val rec = CommitLog.history(f, lake).last
    assert(rec.addedFiles > 0 && rec.removedFiles > 0,
      s"purge must publish its churn: +${rec.addedFiles} " +
        s"-${rec.removedFiles}")
    // the re-synced index prunes the NEW layout exactly
    val got = StatsIndex.readPruned(spark, lake, idx,
      Seq(("k", 10L, 39L))).agg(sum($"v")).head.getLong(0)
    assert(got == (10 until 40).map(2L * _).sum,
      "post-purge pruned read drifted")
  }

  // ---- staged (OCC) purge: conflict + crash arms (r14) --------------

  test("a concurrent append COMMUTES with a staged purge: the purge " +
    "lands on its FIRST attempt, carries the appended clean file by " +
    "name, and the append is never blocked behind the rewrite") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    var hookCalls = 0
    val (rewritten, carried) = ColumnMapping.purge(spark, lake,
      beforeCommit = () => {
        hookCalls += 1
        // lands BETWEEN purge's prepare and its commit section — under
        // the r13 long-lock shape this appender would have blocked (or
        // timed out) for the whole rewrite window; under the narrowed
        // conflict rule it does not even cost the purge a retry
        if (hookCalls == 1)
          assert(Occ.append(spark, lake,
            (100 until 150).map(k => (k, 7L * k)).toDF("k", "v")) > 0L)
      })
    assert(hookCalls == 1,
      s"a clean append must not force a purge retry ($hookCalls " +
        "prepare attempts)")
    // the commit section published over the CURRENT view: the mid-
    // purge append's clean file is carried
    assert(rewritten > 0 && carried > 0,
      s"commute accounting: ($rewritten, $carried)")
    val got = LayoutSink.readCommitted(spark, lake, mergeSchema = true)
    assert(got.count() == 150L,
      "both the purge rewrite and the racing append must survive")
    assert(!spark.read.option("mergeSchema", "true").parquet(lake)
      .columns.contains("extra"), "the dead bytes must still be gone")
    assert(ColumnMapping.mapping(fs(lake), lake).dropped.isEmpty,
      "the tombstone lifts on the winning attempt")
  }

  test("a concurrent MoR DELETE on a carrying file IS a conflict: the " +
    "purge retries and the deleted row stays dead through the rewrite") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    var hookCalls = 0
    val (rewritten, _) = ColumnMapping.purge(spark, lake,
      beforeCommit = () => {
        hookCalls += 1
        // a delete AFTER the rewrite staged: the staged bytes folded
        // the OLD vector set — publishing them would resurrect k=3
        if (hookCalls == 1)
          assert(DeletionVectors.deleteMor(spark, lake, "k = 3") == 1L)
      })
    assert(hookCalls == 2,
      s"DV churn on a carrying file must force a retry ($hookCalls)")
    assert(rewritten > 0)
    val got = DeletionVectors.readMor(spark, lake, mergeSchema = true)
    assert(got.filter($"k" === 3).count() == 0L,
      "the mid-purge delete must hold through the rewrite")
    assert(got.count() == 99L)
  }

  test("STAGED PURGE refuses to lift a tombstone it never probed: a " +
    "concurrent DROP between prepare and commit forces a re-probe " +
    "that reclaims BOTH columns") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    var dropped = false
    val (rewritten, _) = ColumnMapping.purge(spark, lake,
      beforeCommit = () => if (!dropped) {
        dropped = true
        ColumnMapping.drop(spark, lake, "v")
      })
    assert(dropped && rewritten > 0)
    val phys = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(phys.columns.toSeq == Seq("k"),
      s"a stale prepare must not lift 'v' un-purged: " +
        s"${phys.columns.mkString(", ")}")
    assert(ColumnMapping.mapping(fs(lake), lake).dropped.isEmpty,
      "both tombstones lift only once both byte sets are gone")
    assert(LayoutSink.readCommitted(spark, lake).count() == 100L)
  }

  test("MoR DELETE churn on a CLEAN file commutes with the staged " +
    "purge: no retry, the delete holds through the survivor sidecar") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    // a clean batch whose rows the mid-purge delete will target
    assert(Occ.append(spark, lake,
      (100 until 160).map(k => (k, 5L * k)).toDF("k", "v")) > 0L)
    var hookCalls = 0
    val (rewritten, carried) = ColumnMapping.purge(spark, lake,
      beforeCommit = () => {
        hookCalls += 1
        // vectors landing ONLY on the clean file: the narrowed
        // conflict rule reads the changed sidecars under the lock,
        // sees no carrying pair, and publishes through
        if (hookCalls == 1)
          assert(DeletionVectors.deleteMor(spark, lake,
            "k >= 150") == 10L)
      })
    assert(hookCalls == 1,
      s"clean-file DV churn must not cost a retry ($hookCalls)")
    assert(rewritten > 0 && carried > 0)
    val got = DeletionVectors.readMor(spark, lake, mergeSchema = true)
    assert(got.count() == 150L,
      "purge rewrite + clean rows - mid-purge deletes")
    assert(got.filter($"k" >= 150).count() == 0L,
      "the mid-purge delete must hold through the purge publish")
  }

  test("a purge that dies mid-prepare leaves the lake untouched (the " +
    "stage is invisible), and the aged stage sweeps on the next verb") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    val before = dataState(lake)
    val viewBefore = LayoutSink.readCommitted(spark, lake)
      .collect().toSet
    val boom = intercept[RuntimeException] {
      ColumnMapping.purge(spark, lake,
        beforeCommit = () => throw new RuntimeException("crash"))
    }
    assert(boom.getMessage == "crash")
    assert(dataState(lake) == before,
      "a crashed prepare must not move one committed byte")
    assert(LayoutSink.readCommitted(spark, lake).collect().toSet
      == viewBefore)
    val f = fs(lake)
    assert(f.listStatus(new Path(lake)).exists(
      _.getPath.getName.startsWith(".occ-")),
      "the crashed stage should still be on disk (hidden)")
    Occ.sweepStaleStages(f, lake, olderThanMs = 0L)
    assert(!f.listStatus(new Path(lake)).exists(
      _.getPath.getName.startsWith(".occ-")),
      "the aged stage must sweep")
    // and a clean purge afterwards is exact
    val (rewritten, _) = ColumnMapping.purge(spark, lake)
    assert(rewritten > 0)
    assert(LayoutSink.readCommitted(spark, lake).collect().toSet
      == viewBefore)
  }

  test("filesPerRewrite unset sizes replacement files from carrying " +
    "bytes: a tiny purge stays at ONE file, never a fixed fan-out, " +
    "and an explicit count pins it") {
    val lake = mkLake()
    ColumnMapping.drop(spark, lake, "extra")
    val f = fs(lake)
    val beforeNames = CommitLog.dataFileNames(f, lake)
    assert(ColumnMapping.purge(spark, lake)._1 > 0)
    val added = CommitLog.dataFileNames(f, lake) -- beforeNames
    assert(added.size == 1,
      s"~KB of carrying bytes must produce ONE file, got ${added.size}")
    // explicit pin still respected
    val lake2 = mkLake()
    ColumnMapping.drop(spark, lake2, "extra")
    val f2 = fs(lake2)
    val before2 = CommitLog.dataFileNames(f2, lake2)
    assert(ColumnMapping.purge(spark, lake2, filesPerRewrite = 3)._1 > 0)
    assert((CommitLog.dataFileNames(f2, lake2) -- before2).size == 3)
  }
}
