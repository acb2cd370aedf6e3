package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{ChangeDataFeed, CommitLog, MergeInto}
import graft.sources.ChangeDataFeed.Version
import graft.sources.MergeInto.{BySourceDelete, MatchedUpdate,
  NotMatchedInsert}

/** Change data feed over CoW DML: row-level pre/post images land
  * with the mutation's own (id, gen) version key, appends serve as
  * inserts from their committed files, cursors are version keys (an
  * id alone cannot separate an append from the mutation that later
  * reused its id), and every unservable window fails fast instead of
  * silently skipping changes. */
class ChangeDataFeedSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batches 0..2, one file each (keys 0-99, 1000-1099, 2000-2099):
    * v = 2k, s = "x". */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_cdf_").toString + "/lake"
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

  test("update and delete feed pre/post images keyed by the " +
    "mutation's own version; appends feed as inserts") {
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    MergeInto.update(spark, lake, "k < 3", Map("v" -> "v + 100"))
    MergeInto.delete(spark, lake, "k = 1005")
    // cursor after append 1: batch 2's inserts + both mutations
    val feed = ChangeDataFeed.read(spark, lake,
      Version(1, 0), ChangeDataFeed.currentVersion(spark, lake))
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 100L, "update_preimage" -> 3L,
      "update_postimage" -> 3L, "delete" -> 1L), byType.toString)
    // post-images carry the post-SET value, pre-images the original
    assert(feed.filter(col("_change_type") === "update_postimage")
      .agg(sum(col("v"))).head.getLong(0) == (0 + 2 + 4) + 300)
    assert(feed.filter(col("_change_type") === "update_preimage")
      .agg(sum(col("v"))).head.getLong(0) == (0 + 2 + 4))
    assert(feed.filter(col("_change_type") === "delete")
      .select(col("k")).as[Int].head() == 1005)
    // the two mutations share id 2 but carry DISTINCT gens; the
    // append feeds at gen 0
    val keys = feed.select(col("_commit_id"), col("_commit_gen"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(keys.size == 3 && keys.forall(_._1 == 2L), keys.toString)
    assert(keys.count(_._2 == 0L) == 1)
  }

  test("a version cursor separates an append from the mutation that " +
    "reused its id; consumed mutations drop out") {
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    MergeInto.update(spark, lake, "k = 0", Map("v" -> "-1"))
    val v1 = ChangeDataFeed.currentVersion(spark, lake)
    MergeInto.delete(spark, lake, "k = 1")
    val v2 = ChangeDataFeed.currentVersion(spark, lake)
    assert(v1.id == v2.id && v2.gen > v1.gen, s"$v1 $v2")
    // from the append at (2,0): both mutations, no batch-2 re-serve
    val both = ChangeDataFeed.read(spark, lake, Version(2, 0), v2)
    assert(both.count() == 3) // pre+post+delete
    // from v1: only the delete
    val tail = ChangeDataFeed.read(spark, lake, v1, v2)
    assert(tail.select(col("_change_type")).as[String].collect()
      .toSeq == Seq("delete"))
    // fully consumed: empty, not an error
    assert(ChangeDataFeed.read(spark, lake, v2, v2).count() == 0)
  }

  test("merge and mergeClauses feed insert/update/delete rows " +
    "matching their verb semantics") {
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    val from = ChangeDataFeed.currentVersion(spark, lake)
    MergeInto.merge(spark, lake,
      Seq((5, -1L, "upd"), (9999, 9L, "new")).toDF("k", "v", "s"),
      Seq("k"))
    MergeInto.mergeClauses(spark, lake,
      Seq((7, -2L), (8888, 8L)).toDF("k", "nv"), Seq("k"),
      matched = Seq(MatchedUpdate(Map("v" -> "s.nv"))),
      notMatched = Seq(NotMatchedInsert(
        Map("k" -> "s.k", "v" -> "s.nv"))),
      notMatchedBySource = Seq(BySourceDelete(Some("t.k = 2000"))))
    val feed = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 2L, "update_preimage" -> 2L,
      "update_postimage" -> 2L, "delete" -> 1L), byType.toString)
    assert(feed.filter(col("_change_type") === "delete")
      .select(col("k")).as[Int].head() == 2000)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select(col("k"), col("v")).as[(Int, Long)].collect().toSet ==
      Set((5, -1L), (7, -2L)))
    assert(feed.filter(col("_change_type") === "insert")
      .select(col("k")).as[Int].collect().toSet == Set(9999, 8888))
  }

  test("fail fast: a mutation that predates enablement") {
    val lake = mkLake()
    MergeInto.update(spark, lake, "k = 0", Map("v" -> "-1"))
    ChangeDataFeed.enable(spark, lake)
    // the pre-enablement mutation has no change data
    val e1 = intercept[IllegalArgumentException] {
      ChangeDataFeed.read(spark, lake, Version(1, 0),
        ChangeDataFeed.currentVersion(spark, lake)).count()
    }
    assert(e1.getMessage.contains("before the feed was enabled"))
    // cursor past it works: the next mutation feeds
    val v1 = ChangeDataFeed.currentVersion(spark, lake)
    MergeInto.delete(spark, lake, "k = 2")
    assert(ChangeDataFeed.read(spark, lake, v1,
      ChangeDataFeed.currentVersion(spark, lake)).count() == 1)
  }

  test("fail fast: a swept insert segment and a truncating fold " +
    "above the cursor") {
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    val preFold = ChangeDataFeed.currentVersion(spark, lake)
    // the delete REWRITES batch 0's file and sweeps it: batch 0's
    // insert segment is gone and must fail, not silently shrink
    MergeInto.delete(spark, lake, "k = 2")
    val e2 = intercept[IllegalArgumentException] {
      ChangeDataFeed.read(spark, lake, Version.Start,
        ChangeDataFeed.currentVersion(spark, lake)).count()
    }
    assert(e2.getMessage.contains("swept"), e2.getMessage)
    // untouched appends still feed from past the swept one
    assert(ChangeDataFeed.read(spark, lake, Version(0, 0),
      ChangeDataFeed.currentVersion(spark, lake))
      .filter(col("_change_type") === "insert").count() == 200)
    // a fold checkpoint truncates attribution below it
    CommitLog.checkpoint(fs(lake), lake)
    val e3 = intercept[IllegalArgumentException] {
      ChangeDataFeed.read(spark, lake, preFold,
        ChangeDataFeed.currentVersion(spark, lake))
    }
    assert(e3.getMessage.contains("truncated"), e3.getMessage)
  }

  test("merge-on-read verbs feed the same images as their CoW twins; " +
    "a compact stamps an empty segment cursors flow through") {
    import graft.sources.DeletionVectors
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    val from = ChangeDataFeed.currentVersion(spark, lake)
    assert(DeletionVectors.deleteMor(spark, lake, "k = 4") == 1L)
    assert(DeletionVectors.updateMor(spark, lake, "k = 6",
      Map("v" -> "v * 10")) == 1L)
    DeletionVectors.mergeMor(spark, lake,
      Seq((9, -9L, "m"), (7777, 7L, "new")).toDF("k", "v", "s"),
      Seq("k"))
    // a source key matching only a DEAD row feeds as an insert: the
    // key was absent from the live view
    DeletionVectors.mergeMor(spark, lake,
      Seq((4, 44L, "revived")).toDF("k", "v", "s"), Seq("k"))
    val mid = ChangeDataFeed.currentVersion(spark, lake)
    val feed = ChangeDataFeed.read(spark, lake, from, mid)
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("delete" -> 1L, "update_preimage" -> 2L,
      "update_postimage" -> 2L, "insert" -> 2L), byType.toString)
    assert(feed.filter(col("_change_type") === "delete")
      .select(col("k")).as[Int].head() == 4)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select(col("k"), col("v")).as[(Int, Long)].collect().toSet ==
      Set((6, 120L), (9, -9L)))
    assert(feed.filter(col("_change_type") === "insert")
      .select(col("k")).as[Int].collect().toSet == Set(7777, 4))
    // compact folds the vectors physically but changes no live row:
    // the SAME cursor still reads through it, plus zero new rows
    DeletionVectors.compact(spark, lake)
    val after = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    assert(after.count() == feed.count())
    assert(ChangeDataFeed.read(spark, lake, mid,
      ChangeDataFeed.currentVersion(spark, lake)).count() == 0)
  }

  test("OCC verbs stage change rows unlocked and publish them only " +
    "with the winning commit") {
    import graft.sources.Occ
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    val from = ChangeDataFeed.currentVersion(spark, lake)
    // CoW merge first: it refuses a lake with live deletion vectors
    Occ.merge(spark, lake,
      Seq((13, -13L, "occ"), (6666, 6L, "occnew")).toDF("k", "v", "s"),
      Seq("k"))
    assert(Occ.deleteMor(spark, lake, "k = 11") == 1L)
    assert(Occ.updateMor(spark, lake, "k = 12",
      Map("v" -> "v + 1")) == 1L)
    Occ.mergeMor(spark, lake,
      Seq((14, -14L, "mor"), (5555, 5L, "mornew")).toDF("k", "v", "s"),
      Seq("k"))
    val feed = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("delete" -> 1L, "update_preimage" -> 3L,
      "update_postimage" -> 3L, "insert" -> 2L), byType.toString)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select(col("k"), col("v")).as[(Int, Long)].collect().toSet ==
      Set((12, 25L), (13, -13L), (14, -14L)))
    assert(feed.filter(col("_change_type") === "insert")
      .select(col("k")).as[Int].collect().toSet == Set(6666, 5555))
  }

  test("additive schema evolution through the feed: pre-images of " +
    "old rows read NULL in the new column, post-images carry it") {
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    val from = ChangeDataFeed.currentVersion(spark, lake)
    val upd = Seq((5, -1L, "upd", 7L), (9999, 9L, "new", 8L))
      .toDF("k", "v", "s", "bonus")
    MergeInto.merge(spark, lake, upd, Seq("k"), evolveSchema = true)
    val feed = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    assert(feed.columns.contains("bonus"))
    // the pre-image predates the column: NULL, not a fabricated value
    assert(feed.filter(col("_change_type") === "update_preimage")
      .filter(col("bonus").isNull).count() == 1)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select(col("bonus")).as[Long].head() == 7L)
    assert(feed.filter(col("_change_type") === "insert")
      .select(col("bonus")).as[Long].head() == 8L)
    // a later same-schema mutation: its images carry the evolved
    // column too (mergeSchema reads), and windows still union
    MergeInto.delete(spark, lake, "k = 7")
    val all = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    assert(all.filter(col("_change_type") === "delete")
      .select(col("k")).as[Int].head() == 7)
    assert(all.count() == 4)
  }

  test("the feed surfaces LOGICAL column names across a rename, like " +
    "every committed read") {
    import graft.sources.ColumnMapping
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    ColumnMapping.rename(spark, lake, "v", "value")
    val from = ChangeDataFeed.currentVersion(spark, lake)
    // UPDATE's predicate/SET speak physical names (the documented
    // ColumnMapping limitation); the FEED output is logical
    MergeInto.update(spark, lake, "k = 3", Map("v" -> "123"))
    val feed = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    assert(feed.columns.contains("value") && !feed.columns.contains("v"))
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select(col("value")).as[Long].head() == 123L)
  }

  test("versionAt resolves a wall-clock cursor in publish order — " +
    "Delta's startingTimestamp") {
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    Thread.sleep(20)
    val t0 = System.currentTimeMillis()
    Thread.sleep(20)
    MergeInto.update(spark, lake, "k = 3", Map("v" -> "0"))
    Thread.sleep(20)
    val t1 = System.currentTimeMillis()
    val v0 = ChangeDataFeed.versionAt(spark, lake, t0)
    val v1 = ChangeDataFeed.versionAt(spark, lake, t1)
    assert(v0 == Version(2, 0), v0.toString) // the newest append
    assert(v1.id == 2 && v1.gen >= 1, v1.toString)
    assert(ChangeDataFeed.read(spark, lake, v0, v1).count() == 2)
    assert(ChangeDataFeed.read(spark, lake, v1, v1).count() == 0)
    intercept[IllegalArgumentException] {
      ChangeDataFeed.versionAt(spark, lake, 1000L) // prehistoric
    }
  }

  test("the feed works on a shallow clone: post-clone appends " +
    "resolve through the clone chain, mutations feed from the " +
    "clone's own _cdf") {
    import graft.sources.Clone
    val src = mkLake()
    val cloneDir =
      Files.createTempDirectory("graft_cdf_cl_").toString + "/branch"
    Clone.shallow(spark, src, cloneDir)
    ChangeDataFeed.enable(spark, cloneDir)
    val from = ChangeDataFeed.currentVersion(spark, cloneDir)
    // a post-clone append: its manifest names the clone's OWN file —
    // but the window also spans nothing from the source, by pinning
    val f = fs(cloneDir)
    val before = CommitLog.dataFileNames(f, cloneDir)
    val id = CommitLog.maxCommittedId(f, cloneDir) + 1
    Seq((7777, 7L, "b")).toDF("k", "v", "s")
      .coalesce(1).write.mode("append").parquet(cloneDir)
    CommitLog.commit(f, cloneDir, id,
      (CommitLog.dataFileNames(f, cloneDir) -- before).toSeq.sorted)
    // a branch mutation touching INHERITED (source-resident) rows
    MergeInto.update(spark, cloneDir, "k = 5", Map("v" -> "-5"))
    val feed = ChangeDataFeed.read(spark, cloneDir, from,
      ChangeDataFeed.currentVersion(spark, cloneDir))
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L), byType.toString)
    assert(feed.filter(col("_change_type") === "insert")
      .select(col("k")).as[Int].head() == 7777)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select(col("v")).as[Long].head() == -5L)
    // the source lake is untouched by any of it
    assert(graft.streaming.LayoutSink.readCommitted(spark, src)
      .filter(col("k") === 5).select(col("v")).as[Long].head() == 10L)
  }

  test("a losing OCC writer's staged change rows are never served; " +
    "the retry publishes its window exactly once") {
    import graft.sources.Occ
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    val from = ChangeDataFeed.currentVersion(spark, lake)
    // interleave a conflicting update inside the delete's prepare →
    // commit window: the delete loses its first commit, retries on
    // the fresh snapshot, and only the retry's change rows publish
    var injected = false
    assert(Occ.deleteMor(spark, lake, "k = 5", beforeCommit = () => {
      if (!injected) {
        injected = true
        Occ.updateMor(spark, lake, "k = 6", Map("v" -> "0")): Unit
      }
    }) == 1L)
    assert(injected, "the conflict must actually have been injected")
    val feed = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("delete" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L), byType.toString)
    assert(feed.filter(col("_change_type") === "delete")
      .select(col("k")).as[Int].head() == 5)
  }

  test("a losing OCC CLAUSE merge's staged change rows are never " +
    "served; the retry publishes its whole clause program exactly once") {
    import graft.sources.Occ
    import graft.sources.MergeInto.{MatchedDelete, MatchedUpdate,
      NotMatchedInsert}
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    val from = ChangeDataFeed.currentVersion(spark, lake)
    // clause program: delete k=5, fallthrough-update k=6, insert 9999;
    // a conflicting MoR update (k=7) lands inside the merge's window,
    // so the merge loses once and its FIRST attempt's staged images
    // (delete + pre/post + insert) must all vanish with it
    var injected = false
    val src = Seq((5, 0L), (6, -6L), (9999, 123L)).toDF("k", "nv")
    val (marked, appended) = Occ.mergeClausesMor(spark, lake, src,
      Seq("k"),
      matched = Seq(
        MatchedDelete(Some("t.k = 5")),
        MatchedUpdate(Map("v" -> "s.nv"))),
      notMatched = Seq(NotMatchedInsert(
        Map("k" -> "s.k", "v" -> "s.nv", "s" -> "'new'"))),
      beforeCommit = () => {
        if (!injected) {
          injected = true
          Occ.updateMor(spark, lake, "k = 7", Map("v" -> "0")): Unit
        }
      })
    assert(injected, "the conflict must actually have been injected")
    assert(marked == 2L && appended == 2L, s"($marked, $appended)")
    val feed = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
    val byType = feed.groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    // one delete (k=5), two updates (k=6 from the retry, k=7 from the
    // interleaved winner), one insert (9999) — nothing doubled
    assert(byType == Map("delete" -> 1L, "insert" -> 1L,
      "update_preimage" -> 2L, "update_postimage" -> 2L),
      byType.toString)
    assert(feed.filter(col("_change_type") === "delete")
      .select(col("k")).as[Int].head() == 5)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select(col("k")).as[Int].collect().toSet == Set(6, 7))
    assert(feed.filter(col("_change_type") === "insert")
      .select(col("k")).as[Int].head() == 9999)
  }

  test("vacuum reclaims _cdf directories no live checkpoint claims — " +
    "crash debris and folded-away versions — and keeps the live feed") {
    val lake = mkLake()
    val f = fs(lake)
    ChangeDataFeed.enable(spark, lake)
    MergeInto.update(spark, lake, "k = 3", Map("v" -> "0")) // (2,1)
    // crash debris at a key no checkpoint claims
    Seq((1, 1L, "x")).toDF("k", "v", "s")
      .withColumn("_change_type", lit("delete"))
      .write.parquet(s"$lake/_cdf/99.99")
    val swept1 = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept1.contains("_cdf/99.99"), swept1.toString)
    assert(f.exists(new Path(s"$lake/_cdf/2.1")),
      "the live mutation's feed directory must survive vacuum")
    // a fold truncates attribution; the folded mutation's directory
    // becomes unreadable debris and ages into the sweep
    CommitLog.checkpoint(f, lake)
    val swept2 = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept2.contains("_cdf/2.1"), swept2.toString)
  }

  test("age-based retention: expired mutations' feed directories age " +
    "into vacuum's sweep, a pre-fold cursor fails fast with the " +
    "resync message, the live window keeps serving") {
    val lake = mkLake() // appends at ids 0..2
    val f = fs(lake)
    ChangeDataFeed.enable(spark, lake)
    MergeInto.update(spark, lake, "k = 0", Map("v" -> "1")) // (2,1)
    def appendBatch(id: Long, k: Int): Unit = {
      val before = CommitLog.dataFileNames(f, lake)
      Seq((k, 1L, "x")).toDF("k", "v", "s").coalesce(1)
        .write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, id,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    appendBatch(3, 5000) // the expired region ends at a strict id
    Thread.sleep(1200L)  // boundary below this append
    val tMid = System.currentTimeMillis()
    val liveFrom = ChangeDataFeed.currentVersion(spark, lake) // (3,0)
    appendBatch(4, 5001)
    // MoR on purpose: a CoW rewrite would sweep (2,1)'s files and the
    // retention fold at that boundary would (correctly) fail loudly
    graft.sources.DeletionVectors.updateMor(spark, lake, "k = 1",
      Map("v" -> "2")): Unit // (4,1)
    val now = System.currentTimeMillis()
    val (expired, _) = CommitLog.retention(f, lake,
      olderThanMs = now - tMid, graceMs = 0L, nowMs = now)
    assert(expired > 0, "retention must expire the pre-cutoff versions")
    val swept = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept.contains("_cdf/2.1"),
      s"the expired mutation's feed directory must be reclaimed: $swept")
    assert(f.listStatus(new Path(s"$lake/_cdf")).exists(
      _.getPath.getName.startsWith("4.")),
      "the live mutation's feed directory must survive")
    val head = ChangeDataFeed.currentVersion(spark, lake)
    // post-retention consumers keep streaming: insert + pre/post images
    assert(ChangeDataFeed.read(spark, lake, liveFrom, head).count() == 3)
    // a consumer lagging past the horizon is told to resync, loudly
    val ex = intercept[ChangeDataFeed.FeedUnservableException] {
      ChangeDataFeed.read(spark, lake, Version(1, 0), head).count(): Unit
    }
    assert(ex.getMessage.contains("resync"), ex.getMessage)
  }

  test("crash debris: an orphan _cdf directory no checkpoint claims " +
    "is never served and is replaced by the next claimant") {
    val lake = mkLake()
    ChangeDataFeed.enable(spark, lake)
    // fake a crashed mutation: change rows for the key the NEXT
    // publish will claim, checkpoint never lands
    val f = fs(lake)
    Seq((12345, 0L, "ghost")).toDF("k", "v", "s")
      .withColumn("_change_type", lit("delete"))
      .write.parquet(s"$lake/_cdf/2.1")
    // nothing published: the feed serves appends only
    val feed0 = ChangeDataFeed.read(spark, lake, Version(1, 0),
      ChangeDataFeed.currentVersion(spark, lake))
    assert(feed0.filter(col("_change_type") =!= "insert").count() == 0)
    // a real mutation claims (2, 1): the debris is replaced wholesale
    MergeInto.update(spark, lake, "k = 3", Map("v" -> "0"))
    val feed = ChangeDataFeed.read(spark, lake, Version(2, 0),
      ChangeDataFeed.currentVersion(spark, lake))
    assert(feed.filter(col("s") === "ghost").count() == 0)
    assert(feed.count() == 2) // pre + post
    assert(CommitLog.isCommitted(f, lake, 2L))
  }
}
