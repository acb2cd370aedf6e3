package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, MergeInto}
import graft.sources.MergeInto.{BySourceDelete, BySourceUpdate,
  MatchedDelete, MatchedUpdate, NotMatchedInsert}
import graft.streaming.LayoutSink

/** The full MERGE clause grammar ([[MergeInto.mergeClauses]]):
  * conditional matched UPDATE/DELETE, conditional NOT MATCHED INSERT,
  * NOT MATCHED BY SOURCE UPDATE/DELETE — first claiming clause wins,
  * unclaimed rows carry byte-identically, NULL conditions act as
  * false, and touched-file discovery stays proportional to what the
  * clauses can actually change. */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batches 0..2, one file each (keys 0-99, 1000-1099, 2000-2099):
    * v = 2k, s NULL on every k%10==0. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_mcl_").toString + "/lake"
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

  test("full grammar end to end: conditional update, fallthrough " +
    "delete, conditional insert, by-source delete") {
    val lake = mkLake()
    val src = Seq((5, -7L), (15, -8L), (1005, -9L), (9999, 42L),
      (9998, 43L)).toDF("k", "nv")
    val (rw, carried) = MergeInto.mergeClauses(spark, lake, src,
      Seq("k"),
      matched = Seq(
        MatchedUpdate(Map("v" -> "s.nv"), Some("t.k = 5")),
        MatchedDelete()), // fallthrough: every other matched row
      notMatched = Seq(
        NotMatchedInsert(Map("k" -> "s.k", "v" -> "s.nv"),
          Some("s.k = 9999"))), // 9998 fails the condition: no insert
      notMatchedBySource = Seq(BySourceDelete(Some("t.k >= 2050"))))
    // matched keys live in batches 0 and 1; by-source claims batch 2
    assert(rw == 3 && carried == 0, s"($rw, $carried)")
    val now = LayoutSink.readCommitted(spark, lake)
    // 300 - 2 matched deletes (15, 1005) - 50 by-source + 1 insert
    assert(now.count() == 249)
    assert(now.filter(col("k") === 5).select(col("v"))
      .as[Long].head() == -7L)
    assert(now.filter(col("k").isin(15, 1005)).count() == 0)
    assert(now.filter(col("k") >= 2050 && col("k") < 9000).count() == 0)
    // unassigned insert column is NULL
    val ins = now.filter(col("k") === 9999)
    assert(ins.count() == 1)
    assert(ins.select(col("v")).as[Long].head() == 42L)
    assert(ins.filter(col("s").isNull).count() == 1)
    // a row no clause claims carries: k=2 untouched in a rewritten file
    assert(now.filter(col("k") === 2).select(col("v"))
      .as[Long].head() == 4L)
  }

  test("first claiming clause wins; a NULL condition does not act") {
    val lake = mkLake()
    val src = Seq((5, 0L), (10, 0L), (11, 0L)).toDF("k", "nv")
    MergeInto.mergeClauses(spark, lake, src, Seq("k"),
      matched = Seq(
        // k=10 has s NULL: "t.s = 'x'" is NULL -> clause does not act
        MatchedUpdate(Map("v" -> "-1"), Some("t.s = 'x'")),
        MatchedDelete(Some("t.k = 10 OR t.k = 5"))))
    val now = LayoutSink.readCommitted(spark, lake)
    // k=5: s='x', first clause claims it BEFORE the delete can
    assert(now.filter(col("k") === 5).select(col("v"))
      .as[Long].head() == -1L)
    assert(now.filter(col("k") === 11).select(col("v"))
      .as[Long].head() == -1L)
    // k=10: update's condition is NULL, delete's holds
    assert(now.filter(col("k") === 10).count() == 0)
    assert(now.count() == 299)
  }

  test("discovery prunes: files neither matched nor claimed by a " +
    "by-source condition are carried by name") {
    val lake = mkLake()
    val f = fs(lake)
    val before = CommitLog.committedNames(f, lake)
    val src = Seq((5, 0L)).toDF("k", "nv")
    val (rw, carried) = MergeInto.mergeClauses(spark, lake, src,
      Seq("k"),
      matched = Seq(MatchedUpdate(Map("v" -> "s.nv"))),
      notMatchedBySource = Seq(
        BySourceUpdate(Map("s" -> "'aged'"), Some("t.k >= 2050"))))
    // batch 0 holds the matched key, batch 2 the by-source claims;
    // batch 1 (keys 1000-1099) is carried untouched BY NAME
    assert(rw == 2 && carried == 1, s"($rw, $carried)")
    val after = CommitLog.committedNames(f, lake)
    assert((before intersect after).size == 1)
    val now = LayoutSink.readCommitted(spark, lake)
    assert(now.filter(col("s") === "aged").count() == 50)
    assert(now.filter(col("k") === 5).select(col("v"))
      .as[Long].head() == 0L)
    // matched rows are NEVER by-source-claimed even when the
    // predicate would hold; not-matched batch-1 rows carry unchanged
    assert(now.filter(col("k") === 1005).select(col("s"))
      .as[String].head() == "x")
    assert(now.count() == 300)
  }

  test("pure-insert clause merge rewrites nothing") {
    val lake = mkLake()
    val src = Seq((9001, 1L), (9002, 2L)).toDF("k", "nv")
    val (rw, carried) = MergeInto.mergeClauses(spark, lake, src,
      Seq("k"),
      notMatched = Seq(NotMatchedInsert(
        Map("k" -> "s.k", "v" -> "s.nv", "s" -> "'new'"))))
    assert(rw == 0 && carried == 3, s"($rw, $carried)")
    val now = LayoutSink.readCommitted(spark, lake)
    assert(now.count() == 302)
    assert(now.filter(col("s") === "new").count() == 2)
  }

  test("INSERT * takes every lake column from the source by name") {
    val lake = mkLake()
    val src = Seq((9001, 7L, "star")).toDF("k", "v", "s")
    MergeInto.mergeClauses(spark, lake, src, Seq("k"),
      notMatched = Seq(NotMatchedInsert()))
    val row = LayoutSink.readCommitted(spark, lake)
      .filter(col("k") === 9001)
    assert(row.select(col("v")).as[Long].head() == 7L)
    assert(row.select(col("s")).as[String].head() == "star")
  }

  test("merge-on-read clause grammar: claimed rows are DV-marked, " +
    "update images and inserts land in delta files, ZERO rewrites") {
    import graft.sources.DeletionVectors
    val lake = mkLake()
    val f = fs(lake)
    val baseNames = CommitLog.committedNames(f, lake)
    val src = Seq((5, -7L), (15, -8L), (1005, -9L), (9999, 42L),
      (9998, 43L)).toDF("k", "nv")
    val (marked, appended) = DeletionVectors.mergeClausesMor(spark,
      lake, src, Seq("k"),
      matched = Seq(
        MatchedUpdate(Map("v" -> "s.nv"), Some("t.k = 5")),
        MatchedDelete()),
      notMatched = Seq(
        NotMatchedInsert(Map("k" -> "s.k", "v" -> "s.nv"),
          Some("s.k = 9999"))),
      notMatchedBySource = Seq(BySourceDelete(Some("t.k >= 2050"))))
    // 1 update + 2 matched deletes + 50 by-source deletes marked;
    // 1 post-image + 1 insert appended
    assert(marked == 53 && appended == 2, s"($marked, $appended)")
    // not one base file was rewritten — they are all still committed
    assert(baseNames.subsetOf(CommitLog.committedNames(f, lake)))
    val now = DeletionVectors.readMor(spark, lake)
    assert(now.count() == 249)
    assert(now.filter(col("k") === 5).select(col("v"), col("s"))
      .as[(Long, String)].head() == ((-7L, "x")))
    assert(now.filter(col("k").isin(15, 1005)).count() == 0)
    assert(now.filter(col("k") >= 2050 && col("k") < 9000).count() == 0)
    assert(now.filter(col("k") === 9999).count() == 1)
    assert(now.filter(col("k") === 9998).count() == 0)
  }

  test("MoR and CoW clause merges land the identical end state; a " +
    "dead-key-only match inserts") {
    import graft.sources.DeletionVectors
    val cow = mkLake()
    val mor = mkLake()
    val src = Seq((7, 0L), (2020, 1L), (8888, 8L)).toDF("k", "nv")
    val clausesM = Seq(
      MatchedUpdate(Map("v" -> "s.nv + t.v"), Some("t.k = 7")),
      MatchedDelete())
    val clausesI = Seq(NotMatchedInsert(
      Map("k" -> "s.k", "v" -> "s.nv", "s" -> "'ins'")))
    val clausesB: Seq[graft.sources.MergeInto.BySourceClause] =
      Seq(BySourceUpdate(Map("s" -> "'aged'"), Some("t.k = 1050")))
    MergeInto.mergeClauses(spark, cow, src, Seq("k"),
      matched = clausesM, notMatched = clausesI,
      notMatchedBySource = clausesB)
    DeletionVectors.mergeClausesMor(spark, mor, src, Seq("k"),
      matched = clausesM, notMatched = clausesI,
      notMatchedBySource = clausesB)
    val a = graft.streaming.LayoutSink.readCommitted(spark, cow)
      .select(col("k"), col("v"), col("s"))
      .as[(Int, Long, String)].collect().toSet
    val b = DeletionVectors.readMor(spark, mor)
      .select(col("k"), col("v"), col("s"))
      .as[(Int, Long, String)].collect().toSet
    assert(a == b)
    // dead-key-only match: kill k = 4, then merge a source row for it
    DeletionVectors.deleteMor(spark, mor, "k = 4")
    val (m2, a2) = DeletionVectors.mergeClausesMor(spark, mor,
      Seq((4, 44L)).toDF("k", "nv"), Seq("k"),
      matched = Seq(MatchedUpdate(Map("v" -> "s.nv"))),
      notMatched = Seq(NotMatchedInsert(
        Map("k" -> "s.k", "v" -> "s.nv", "s" -> "'revived'"))))
    assert(m2 == 0 && a2 == 1, s"($m2, $a2)")
    assert(DeletionVectors.readMor(spark, mor)
      .filter(col("k") === 4).select(col("s"))
      .as[String].head() == "revived")
  }

  test("a no-op MoR clause merge publishes nothing") {
    import graft.sources.DeletionVectors
    val lake = mkLake()
    val f = fs(lake)
    val before = CommitLog.committedNames(f, lake)
    val (m, a) = DeletionVectors.mergeClausesMor(spark, lake,
      Seq((123456, 0L)).toDF("k", "nv"), Seq("k"),
      matched = Seq(MatchedDelete(Some("t.k = -1"))))
    assert(m == 0 && a == 0)
    assert(CommitLog.committedNames(f, lake) == before)
  }

  test("fail fast: shadowing unconditioned clause, INSERT * with a " +
    "missing source column, unknown SET target, no clauses") {
    val lake = mkLake()
    val src = Seq((5, 0L)).toDF("k", "nv")
    intercept[IllegalArgumentException] {
      MergeInto.mergeClauses(spark, lake, src, Seq("k"),
        matched = Seq(MatchedDelete(), // unconditioned, not last
          MatchedUpdate(Map("v" -> "0"), Some("t.k = 5"))))
    }
    intercept[IllegalArgumentException] { // src lacks v and s
      MergeInto.mergeClauses(spark, lake, src, Seq("k"),
        notMatched = Seq(NotMatchedInsert()))
    }
    intercept[IllegalArgumentException] {
      MergeInto.mergeClauses(spark, lake, src, Seq("k"),
        matched = Seq(MatchedUpdate(Map("nope" -> "0"))))
    }
    intercept[IllegalArgumentException] {
      MergeInto.mergeClauses(spark, lake, src, Seq("k"))
    }
  }
}
