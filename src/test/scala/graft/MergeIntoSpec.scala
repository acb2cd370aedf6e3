package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, MergeInto}
import graft.streaming.LayoutSink

/** Copy-on-write MERGE/DELETE: matched rows replaced exactly once,
  * inserts land exactly once, files without a matched key are carried
  * into the new version BY NAME (zero I/O), the version flip is one
  * checkpoint publish, and the replaced files become exactly the
  * orphans vacuum sweeps. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batches 0..2, one file each: k unique, s NULL on every k%10==0. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_merge_").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(b * 1000 + _)
        .map(k => (k, k.toLong * 2, if (k % 10 == 0) null else "x"))
        .toDF("k", "v", "s")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    lake
  }

  test("merge replaces matched keys, inserts new ones, carries " +
    "untouched files by name, and sweeps replaced files immediately") {
    val lake = mkLake()
    val f = fs(lake)
    val beforeNames = CommitLog.committedNames(f, lake)
    // batch-2's file holds keys 2000..2099 — no update touches it
    val untouchable = beforeNames.filter { n =>
      spark.read.parquet(s"$lake/$n").agg(min(col("k"))).head.getInt(0) >= 2000
    }
    assert(untouchable.size == 1)
    val updates = Seq(
      (5, -1L, "upd"), (1005, -1L, "upd"), // matched (batches 0 and 1)
      (9999, 42L, "new")).toDF("k", "v", "s") // unmatched insert
    val (rewritten, carried) = MergeInto.merge(spark, lake, updates, Seq("k"))
    assert(rewritten == 2 && carried == 1, s"($rewritten, $carried)")
    val now = LayoutSink.readCommitted(spark, lake)
    assert(now.count() == 301)
    assert(now.filter(col("k").isin(5, 1005)).select(col("v"))
      .as[Long].collect().toSeq == Seq(-1L, -1L))
    assert(now.filter(col("k") === 9999).count() == 1)
    // untouched file carried BY NAME; replaced files swept under the
    // still-held lock, so the PLAIN directory read converges at once
    val afterNames = CommitLog.committedNames(f, lake)
    assert(untouchable.subsetOf(afterNames))
    val stranded = beforeNames -- afterNames
    assert(stranded.size == 2)
    assert(stranded.forall(n => !f.exists(new Path(lake, n))),
      "replaced files must be swept by the mutation itself")
    assert(spark.read.parquet(lake).count() == 301)
    // replay safety: every previously committed batch id still reads
    // as committed after the version flip
    (0L to 2L).foreach(id => assert(CommitLog.isCommitted(f, lake, id)))
  }

  test("a mutation checkpoint never claims an uncommitted batch id: " +
    "merging a bootstrap-only lake leaves batch 0 replayable") {
    // lake with ONLY grandfathered data (bootstrap manifest -1)
    val dir = Files.createTempDirectory("graft_merge_boot_").toString
    val lake = s"$dir/lake"
    val f = fs(lake)
    (0 until 100).map(k => (k, k.toLong, "x")).toDF("k", "v", "s")
      .coalesce(1).write.parquet(lake)
    CommitLog.commit(f, lake, -1L,
      CommitLog.dataFileNames(f, lake).toSeq.sorted)
    MergeInto.update(spark, lake, "k < 10", Map("v" -> "v + 1000"))
    // the mutation must NOT have minted batch id 0 — a later first
    // streaming batch would otherwise replay as a silent no-op
    assert(!CommitLog.isCommitted(f, lake, 0L),
      "mutation checkpoint stole batch id 0")
    LayoutSink.processBatch(
      Seq((7777, 1L, "b0")).toDF("k", "v", "s"), 0L, lake,
      s"$dir/idx", Seq("k", "v"), bits = 10, filesPerBatch = 1,
      curve = "morton")
    val now = LayoutSink.readCommitted(spark, lake)
    assert(now.count() == 101)
    assert(now.filter(col("k") === 7777).count() == 1)
  }

  test("history APIs fail fast across a DML mutation: no silent " +
    "post-mutation snapshot at the mutated id, no empty CDC delta") {
    val lake = mkLake()
    val f = fs(lake)
    // pre-mutation: both history reads work
    assert(LayoutSink.readCommittedAt(spark, lake, 2L).count() == 300)
    assert(LayoutSink.readChanges(spark, lake, 1L, 2L).count() == 100)
    MergeInto.delete(spark, lake, "k < 50")
    // time travel to the mutated id must refuse — the pre-mutation
    // snapshot a pinner captured no longer exists
    val e1 = intercept[IllegalArgumentException] {
      CommitLog.committedNamesAt(f, lake, 2L)
    }
    assert(e1.getMessage.contains("rewritten"))
    // CDC from any cursor at-or-before the mutation id must refuse —
    // an add-only delta cannot express an in-place rewrite
    val e2 = intercept[IllegalArgumentException] {
      CommitLog.changedNames(f, lake, 1L, 2L)
    }
    assert(e2.getMessage.contains("mutation"))
    // the present committed view is of course fine
    assert(LayoutSink.readCommitted(spark, lake).count() == 250)
  }

  test("merge rejects a type clash on a shared column") {
    val lake = mkLake()
    // v is LONG in the lake; int-typed updates must fail fast
    val bad = Seq((5, 1, "x")).toDF("k", "v", "s")
    val e = intercept[IllegalArgumentException] {
      MergeInto.merge(spark, lake, bad, Seq("k"))
    }
    assert(e.getMessage.contains("type clash"))
  }

  test("duplicate update keys fail fast before any write") {
    val lake = mkLake()
    val updates = Seq((5, 0L, "a"), (5, 1L, "b")).toDF("k", "v", "s")
    val before = CommitLog.committedNames(fs(lake), lake)
    intercept[IllegalArgumentException] {
      MergeInto.merge(spark, lake, updates, Seq("k"))
    }
    assert(CommitLog.committedNames(fs(lake), lake) == before)
  }

  test("additive schema evolution: extra columns need the flag, " +
    "carried rows read NULL under mergeSchema, partial rows fail fast") {
    val lake = mkLake()
    val updates = Seq((5, -1L, "upd", 3.5)).toDF("k", "v", "s", "w")
    // surprise extra column without the flag: fail fast
    intercept[IllegalArgumentException] {
      MergeInto.merge(spark, lake, updates, Seq("k"))
    }
    val (rw, carried) =
      MergeInto.merge(spark, lake, updates, Seq("k"), evolveSchema = true)
    assert(rw == 1 && carried == 2)
    val now = LayoutSink.readCommitted(spark, lake, mergeSchema = true)
    assert(now.columns.contains("w") && now.count() == 300)
    assert(now.filter(col("k") === 5).select(col("w"))
      .head.getDouble(0) == 3.5)
    // every other row — rewritten-file survivors AND carried old-schema
    // files — backfills NULL
    assert(now.filter(col("w").isNull).count() == 299)
    // an update row missing a lake column is a partial row: fail fast
    intercept[IllegalArgumentException] {
      MergeInto.merge(spark, lake, Seq((6, 1L)).toDF("k", "v"), Seq("k"))
    }
  }

  test("update applies SET to matching rows only, against the " +
    "pre-update row, and carries untouched files") {
    val lake = mkLake()
    // k < 50 lives in batch-0's file; v reads the PRE-update row
    val (rw, carried) = MergeInto.update(spark, lake, "k < 50",
      Map("v" -> "v + k", "s" -> "'u'"))
    assert(rw == 1 && carried == 2, s"($rw, $carried)")
    val now = LayoutSink.readCommitted(spark, lake)
    assert(now.count() == 300)
    assert(now.filter(col("k") === 10).select(col("v"))
      .head.getLong(0) == 30) // 20 + 10, not (20+10)+10
    assert(now.filter(col("s") === "u").count() == 50)
    // non-matching rows — even in the rewritten file (k=61) and in
    // carried files (k=1001) — untouched (k=60 is a fixture NULL-s row)
    assert(now.filter(col("k") === 61).select(col("s"))
      .head.getString(0) == "x")
    assert(now.filter(col("k") === 1001).select(col("s"))
      .head.getString(0) == "x")
    intercept[IllegalArgumentException] {
      MergeInto.update(spark, lake, "k < 5", Map("nope" -> "1"))
    }
  }

  test("writer lock: a held lock fails mutations fast, a stale one " +
    "is broken, and the lock releases after success AND failure") {
    val lake = mkLake()
    val f = fs(lake)
    val lock = new Path(CommitLog.logDir(lake), "WRITER_LOCK")
    val out = f.create(lock, false)
    try out.write("held".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] {
      MergeInto.delete(spark, lake, "k < 10")
    }
    assert(e.getMessage.contains("writer lock"))
    // a crashed holder's lock (older than staleMs) is broken and the
    // mutation proceeds
    f.setTimes(lock, System.currentTimeMillis() - 3600000L, -1)
    val (rw, _) = MergeInto.delete(spark, lake, "k < 10")
    assert(rw == 1 && !f.exists(lock))
    // failure inside the locked section still releases the lock
    intercept[IllegalArgumentException] {
      MergeInto.merge(spark, lake, Seq((1, 1L)).toDF("k", "v"), Seq("k"))
    }
    assert(!f.exists(lock))
  }

  test("ingest batches take the writer lock too: a held lock fails " +
    "the batch, release lets it proceed") {
    val dir = Files.createTempDirectory("graft_merge_ing_").toString
    val lake = s"$dir/lake"
    val f = fs(lake)
    f.mkdirs(new Path(CommitLog.logDir(lake)))
    val lock = new Path(CommitLog.logDir(lake), "WRITER_LOCK")
    val out = f.create(lock, false)
    try out.write("held".getBytes("UTF-8")) finally out.close()
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    intercept[IllegalStateException] {
      LayoutSink.processBatch(df, 0L, lake, s"$dir/idx", Seq("a", "b"),
        bits = 10, filesPerBatch = 1, curve = "morton")
    }
    f.delete(lock, false)
    LayoutSink.processBatch(df, 0L, lake, s"$dir/idx", Seq("a", "b"),
      bits = 10, filesPerBatch = 1, curve = "morton")
    assert(LayoutSink.readCommitted(spark, lake).count() == 100)
  }

  test("delete drops exactly the matching rows, keeps NULL-predicate " +
    "rows, and rewrites only touched files") {
    val lake = mkLake()
    // k < 50 lives in batch-0's file only
    val (rw, carried) = MergeInto.delete(spark, lake, "k < 50")
    assert(rw == 1 && carried == 2, s"($rw, $carried)")
    val now = LayoutSink.readCommitted(spark, lake)
    assert(now.count() == 250)
    assert(now.filter(col("k") < 50).count() == 0)
    // NULL semantics: s <> 'x' is NULL for the s-NULL rows and false
    // for every other — nothing matches, nothing is deleted
    val (rw2, _) = MergeInto.delete(spark, lake, "s <> 'x'")
    assert(rw2 == 0)
    assert(LayoutSink.readCommitted(spark, lake).count() == 250)
  }

  test("DML on an indexed lake: index-assisted touched discovery, " +
    "index refreshed to the new version, stale indexes never trusted") {
    import graft.sources.StatsIndex
    val lake = mkLake()
    val idx = lake.stripSuffix("/lake") + "/idx"
    StatsIndex.build(spark, lake, Seq("k"), idx,
      bloomCols = Seq("k"), bloomItems = 10000, bloomFpp = 0.001)
    // keys confined to batch-1's file; index discovery must find
    // exactly it (range-clustered files → min/max arm prunes 0 and 2)
    val updates = Seq((1005, -1L, "u"), (1050, -2L, "u"))
      .toDF("k", "v", "s")
    val (rw, carried) = MergeInto.merge(spark, lake, updates, Seq("k"),
      indexDir = Some(idx))
    assert(rw == 1 && carried == 2, s"($rw, $carried)")
    // the index followed the version flip: no vanished files, fresh
    // rewrite covered — a pruned read over the mutated lake is exact
    val f = fs(lake)
    assert(StatsIndex.indexedFiles(spark, idx)
      .map(p => new Path(p).getName).toSet ==
      CommitLog.committedNames(f, lake),
      "index file set drifted from the committed view")
    val pruned = StatsIndex.readPrunedTyped(spark, lake, idx,
      Seq(StatsIndex.LongRange("k", 1000L, 1099L)))
      .agg(sum(col("v"))).head.getLong(0)
    val full = LayoutSink.readCommitted(spark, lake)
      .filter(col("k").between(1000, 1099))
      .agg(sum(col("v"))).head.getLong(0)
    assert(pruned == full, s"pruned $pruned vs full $full")
    // DELETE keeps the index consistent too
    MergeInto.delete(spark, lake, "k < 50", indexDir = Some(idx))
    assert(StatsIndex.indexedFiles(spark, idx)
      .map(p => new Path(p).getName).toSet ==
      CommitLog.committedNames(f, lake))
    assert(StatsIndex.readPrunedTyped(spark, lake, idx,
      Seq(StatsIndex.LongRange("k", 0L, 99L))).count() ==
      LayoutSink.readCommitted(spark, lake)
        .filter(col("k").between(0, 99)).count())
    // a STALE index (out-of-band committed batch it never saw) is not
    // trusted for discovery: the merge still finds the new file's key
    val before = CommitLog.dataFileNames(f, lake)
    (9000 until 9100).map(k => (k, k.toLong, "x")).toDF("k", "v", "s")
      .coalesce(1).write.mode("append").parquet(lake)
    CommitLog.commit(f, lake, 100L,
      (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    val (rw2, _) = MergeInto.merge(spark, lake,
      Seq((9050, -3L, "u2")).toDF("k", "v", "s"), Seq("k"),
      indexDir = Some(idx))
    assert(rw2 == 1, "stale-index fallback missed the touched file")
    assert(LayoutSink.readCommitted(spark, lake)
      .filter(col("k") === 9050).select(col("v"))
      .as[Long].head() == -3L)
    // and the refresh after that merge re-synced the index
    assert(StatsIndex.indexedFiles(spark, idx)
      .map(p => new Path(p).getName).toSet ==
      CommitLog.committedNames(f, lake))
  }

  test("index-assisted discovery covers STRING keys (doc-id lakes) " +
    "and COMPOSITE keys via candidate-set intersection; candidates " +
    "are always a superset of the full-pass touched set") {
    import graft.sources.StatsIndex
    // string-keyed doc lake: 3 committed batches of contiguous doc-id
    // ranges, bloom-indexed on the key
    val lake = Files.createTempDirectory("graft_merge_s_").toString +
      "/lake"
    val f = fs(lake)
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(b * 1000 + _)
        .map(i => (f"doc-$i%06d", i.toLong, i % 7))
        .toDF("doc_id", "v", "g")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    val idx = lake.stripSuffix("/lake") + "/idx"
    StatsIndex.build(spark, lake, Seq("doc_id"), idx,
      bloomCols = Seq("doc_id"), bloomItems = 10000, bloomFpp = 0.001)
    // keys confined to batch-1's file: the string min/max arm must
    // find exactly it (candidates ⊇ touched is the contract; here the
    // clustered fixture makes them equal, proving real acceleration)
    val cand = StatsIndex.prunedForKeysString(spark, idx, "doc_id",
      Seq("doc-001005", "doc-001050"))
    assert(cand.size == 1, s"string candidates ${cand.size} of 3")
    val touchedFull = spark.read.parquet(
        CommitLog.committedNames(f, lake).toSeq.sorted
          .map(n => s"$lake/$n"): _*)
      .filter(col("doc_id").isin("doc-001005", "doc-001050"))
      .select(col("_metadata.file_path")).distinct()
      .collect().map(r => new Path(r.getString(0)).getName).toSet
    assert(touchedFull.subsetOf(
      cand.map(p => new Path(p).getName).toSet),
      "string candidate set excluded a truly-touched file")
    val updates = Seq(("doc-001005", -1L, 0), ("doc-001050", -2L, 1),
      ("doc-099999", 9L, 2)).toDF("doc_id", "v", "g")
    val (rw, carried) = MergeInto.merge(spark, lake, updates,
      Seq("doc_id"), indexDir = Some(idx))
    assert(rw == 1 && carried == 2, s"string-key merge ($rw, $carried)")
    val got = LayoutSink.readCommitted(spark, lake)
      .filter(col("doc_id")
        .isin("doc-001005", "doc-001050", "doc-099999"))
      .orderBy("doc_id").select("v").as[Long].collect().toSeq
    assert(got == Seq(-1L, -2L, 9L), s"string-key merge rows $got")
    // COMPOSITE (string, long) key: per-column candidate sets
    // intersect; result must still be exact
    val updates2 = Seq(("doc-002010", -10L, 3)).toDF("doc_id", "v", "g")
    val (rw2, _) = MergeInto.merge(spark, lake, updates2,
      Seq("doc_id", "v"), indexDir = Some(idx))
    // v = -10 exists nowhere → pure insert, zero rewrites
    assert(rw2 == 0, s"composite no-match rewrote $rw2")
    val (rw3, _) = MergeInto.merge(spark, lake,
      Seq(("doc-000042", 42L, 9)).toDF("doc_id", "v", "g"),
      Seq("doc_id", "v"), indexDir = Some(idx))
    assert(rw3 == 1, s"composite match rewrote $rw3")
    assert(LayoutSink.readCommitted(spark, lake)
      .filter(col("doc_id") === "doc-000042").select("g")
      .as[Int].head() == 9)
  }

  test("index-assisted PREDICATE discovery: the impliedRanges hint " +
    "restricts delete/update discovery to candidate files, deletes " +
    "exactly, and an empty candidate set rewrites nothing") {
    import graft.sources.StatsIndex
    val lake = mkLake() // 3 files: k 0-99, 1000-1099, 2000-2099
    val idx = lake.stripSuffix("/lake") + "/idx"
    StatsIndex.build(spark, lake, Seq("k"), idx)
    // retention delete confined to batch-0's file by the range hint
    val (rw, carried) = MergeInto.delete(spark, lake, "k < 50",
      indexDir = Some(idx),
      impliedRanges = Seq(StatsIndex.LongRange("k", Long.MinValue, 49L)))
    assert(rw == 1 && carried == 2, s"hinted delete ($rw, $carried)")
    val left = LayoutSink.readCommitted(spark, lake)
    assert(left.filter(col("k") < 50).count() == 0 &&
      left.count() == 250, "hinted delete removed the wrong rows")
    // index followed the mutation
    assert(StatsIndex.indexedFiles(spark, idx)
      .map(p => new Path(p).getName).toSet ==
      CommitLog.committedNames(fs(lake), lake))
    // a range provably matching NO file: zero rewrites, zero scans
    val (rw2, _) = MergeInto.delete(spark, lake, "k > 900000",
      indexDir = Some(idx),
      impliedRanges = Seq(
        StatsIndex.LongRange("k", 900001L, Long.MaxValue)))
    assert(rw2 == 0, "empty candidate set must rewrite nothing")
    // UPDATE with the same hint machinery
    val (rw3, _) = MergeInto.update(spark, lake,
      "k BETWEEN 2000 AND 2010", Map("v" -> "-1"),
      indexDir = Some(idx),
      impliedRanges = Seq(StatsIndex.LongRange("k", 2000L, 2010L)))
    assert(rw3 == 1, s"hinted update rewrote $rw3")
    val after = LayoutSink.readCommitted(spark, lake)
    assert(after.filter(col("k").between(2000, 2010) &&
      col("v") =!= -1L).count() == 0, "hinted update missed rows")
    assert(after.filter(col("k") === 2050).select("v")
      .as[Long].head() == 4100L, "non-matching row in touched file changed")
  }

  test("UpsertSink: multi-batch streaming merge reaches the last-wins " +
    "end state; replay from a wiped checkpoint is idempotent") {
    val lake = mkLake()
    val dir = Files.createTempDirectory("graft_upsink_").toString
    // 4 update files → 4 micro-batches: updates overlay k%5==0 (all
    // three base files touched), inserts add 5000..5039; key-unique
    // across the whole stream
    val upd = spark.range(0, 3000)
      .filter(col("id") % 5 === 0 && col("id") % 1000 < 100)
      .selectExpr("CAST(id AS INT) AS k", "-id AS v", "'u' AS s")
    val ins = spark.range(5000, 5040)
      .selectExpr("CAST(id AS INT) AS k", "id AS v", "'i' AS s")
    upd.unionByName(ins).repartition(4).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def run(ckp: String): Unit = {
      val q = graft.streaming.UpsertSink.start(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
        lake, ckp, Seq("k"))
      q.awaitTermination()
    }
    run(s"$dir/ckp1")
    def state() = LayoutSink.readCommitted(spark, lake)
      .orderBy("k").select("k", "v", "s").collect().toSeq
    val after = state()
    assert(after.size == 340)
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.filter(col("s") === "u").count() == 60 &&
      got.filter(col("s") === "i").count() == 40)
    assert(got.filter(col("k") % 5 === 0 && col("k") < 3000 &&
      col("v") =!= -col("k").cast("long")).count() == 0)
    // replay the ENTIRE stream with a fresh checkpoint: every batch
    // re-merges — the lake must converge to the identical state
    run(s"$dir/ckp2")
    assert(state() == after, "replayed upsert stream changed the lake")
  }

  test("UpsertSink mor = true: the merge-on-read arm reaches the " +
    "identical end state with ZERO data files rewritten, and replay " +
    "is idempotent in view space") {
    import graft.sources.DeletionVectors
    val lake = mkLake()
    val f = fs(lake)
    val dir = Files.createTempDirectory("graft_upsinkm_").toString
    val upd = spark.range(0, 3000)
      .filter(col("id") % 5 === 0 && col("id") % 1000 < 100)
      .selectExpr("CAST(id AS INT) AS k", "-id AS v", "'u' AS s")
    val ins = spark.range(5000, 5040)
      .selectExpr("CAST(id AS INT) AS k", "id AS v", "'i' AS s")
    upd.unionByName(ins).repartition(4).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val dataBefore = CommitLog.committedNames(f, lake)
    def run(ckp: String): Unit = {
      val q = graft.streaming.UpsertSink.start(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
        lake, ckp, Seq("k"), mor = true)
      q.awaitTermination()
    }
    run(s"$dir/ckp1")
    // EVERY pre-stream data file survived by name: no batch rewrote
    assert(dataBefore.subsetOf(CommitLog.committedNames(f, lake)),
      "a MoR upsert batch rewrote a data file")
    def view() = DeletionVectors.readMor(spark, lake)
      .orderBy("k").select("k", "v", "s").collect().toSeq
    val after = view()
    assert(after.size == 340)
    val got = DeletionVectors.readMor(spark, lake)
    assert(got.filter(col("s") === "u").count() == 60 &&
      got.filter(col("s") === "i").count() == 40)
    // replay from a wiped checkpoint: every batch re-merges MoR — the
    // VIEW converges identically (earlier deltas die, twins append)
    run(s"$dir/ckp2")
    assert(view() == after, "replayed MoR upsert stream changed the view")
    // compact folds the sidecar away; the plain read equals the view
    DeletionVectors.compact(spark, lake)
    assert(LayoutSink.readCommitted(spark, lake)
      .orderBy("k").select("k", "v", "s").collect().toSeq == after)
  }

  test("mutations AFTER additive evolution see the union schema " +
    "deterministically: CoW delete/update and MoR delete on the " +
    "evolved column work regardless of footer pick order") {
    import graft.sources.DeletionVectors
    val lake = mkLake()
    // evolve: one merge adds `tag` (rewrites one file, inserts one row)
    MergeInto.merge(spark, lake,
      Seq((5, -1L, "x", "hot"), (9999, 1L, "n", "hot"))
        .toDF("k", "v", "s", "tag"),
      Seq("k"), evolveSchema = true)
    // CoW DELETE with a predicate ON the evolved column: rows from
    // files that physically lack `tag` read it as NULL (kept by SQL
    // NULL semantics), never an AnalysisException or a silent miss
    val (rw, _) = MergeInto.delete(spark, lake, "tag = 'hot'")
    assert(rw >= 1)
    val now = LayoutSink.readCommitted(spark, lake, mergeSchema = true)
    assert(now.count() == 299L) // 300 + 1 insert - 2 hot rows
    assert(now.filter(col("k").isin(5, 9999)).count() == 0)
    // CoW UPDATE setting the evolved column across mixed-schema files
    MergeInto.update(spark, lake, "k < 3", Map("tag" -> "'warm'"))
    val upd = LayoutSink.readCommitted(spark, lake, mergeSchema = true)
    assert(upd.filter(col("tag") === "warm").count() == 3L)
    // MoR delete with a predicate on the evolved column: only the
    // updated rows carry 'warm'; NULL-tag rows survive
    assert(DeletionVectors.deleteMor(spark, lake, "tag = 'warm'") == 3L)
    assert(DeletionVectors.readMor(spark, lake, mergeSchema = true)
      .count() == 296L)
  }
}
