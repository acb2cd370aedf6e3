package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, DeletionVectors}
import graft.streaming.LayoutSink

/** Age-based retention ([[graft.sources.CommitLog.retention]]):
  * versions superseded before the cutoff become unreachable (loudly)
  * and their EXCLUSIVE bytes are reclaimed; everything newer — time
  * travel included — is untouched. Oracle twin: `q85_retention`. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batches 0..3 committed, 100 rows each: k in [100b, 100b+100). */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_ret_").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 3) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(i => (100 * b + i, b.toLong)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    lake
  }

  private def backdate(lake: String, names: Seq[String],
      toMs: Long): Unit = {
    val f = fs(lake)
    val log = new Path(CommitLog.logDir(lake))
    f.listStatus(log).foreach { s =>
      if (names.contains(s.getPath.getName))
        f.setTimes(s.getPath, toMs, -1)
    }
  }

  test("versions superseded before the cutoff expire — travel below " +
    "the fold fails loudly, the boundary and everything newer stay " +
    "exactly readable") {
    val lake = mkLake()
    val f = fs(lake)
    val now = System.currentTimeMillis()
    // records 0..2 published 'a week ago'; record 3 is fresh — so
    // versions 0 and 1 were superseded before the cutoff, version 2
    // was not (its successor, 3, is fresh)
    backdate(lake, Seq("0.manifest", "1.manifest", "2.manifest"),
      now - 7L * 86400000L)
    val (expired, _) = CommitLog.retention(f, lake,
      olderThanMs = 86400000L, graceMs = 0L, nowMs = now)
    assert(expired == 2, s"versions 0 and 1 expire, saw $expired")
    // below the boundary: loud
    val e = intercept[IllegalArgumentException] {
      CommitLog.committedNamesAt(f, lake, 0L)
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // the boundary id serves the fold's snapshot; newer travel intact
    assert(LayoutSink.readCommittedAt(spark, lake, 1L).count() == 200L)
    assert(LayoutSink.readCommittedAt(spark, lake, 2L).count() == 300L)
    assert(LayoutSink.readCommitted(spark, lake).count() == 400L)
    // no byte was eligible: every file is still in the live view
    assert(CommitLog.dataFileNames(f, lake).size == 4)
    // a second pass with the same clock is a no-op
    assert(CommitLog.retention(f, lake, olderThanMs = 86400000L,
      graceMs = 0L, nowMs = now) == ((0, Seq.empty)))
  }

  test("expired versions' EXCLUSIVE bytes are reclaimed: a rolled-past " +
    "batch's file is swept once its last referencing record expires, " +
    "and reading it fails loudly while shared bytes survive") {
    val lake = mkLake() // batches 0..3
    val f = fs(lake)
    // roll back to batch 1: batches 2 and 3 leave the current view but
    // their manifests (and bytes) stay — reachable history
    CommitLog.restore(f, lake, toBatchId = 1L)
    // new life after the restore: batches 4 and 5
    for (b <- 4 to 5) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 50).map(i => (1000 * b + i, b.toLong)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b.toLong,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    val preFiles = CommitLog.dataFileNames(f, lake)
    assert(preFiles.size == 6, "all six batches' bytes retained so far")
    val now = System.currentTimeMillis()
    // everything up to and including batch 4's manifest is old; only
    // batch 5 is fresh — the restore checkpoint and the rolled-past
    // manifests all expire
    backdate(lake, f.listStatus(new Path(CommitLog.logDir(lake)))
      .map(_.getPath.getName).toSeq
      .filterNot(n => n.startsWith("5.") || n == "WRITER_LOCK"),
      now - 7L * 86400000L)
    val (expired, swept) = CommitLog.retention(f, lake,
      olderThanMs = 86400000L, graceMs = 0L, nowMs = now)
    assert(expired >= 5, s"saw $expired")
    // batches 2 and 3 were referenced ONLY by expired records (the
    // restore dropped them from every later view) — reclaimed
    assert(swept.size == 2, s"swept $swept")
    assert(CommitLog.dataFileNames(f, lake).size == 4)
    // the current view (batches 0, 1 via the restore + 4 + 5) intact
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.count() == 300L)
    assert(got.filter(col("v") === 2L || col("v") === 3L).count() == 0L)
    assert(got.filter(col("k") >= 5000).count() == 50L)
  }

  test("retention carries covered deletion vectors through the fold — " +
    "the MUTATION record expires but its dead rows stay dead") {
    val lake = mkLake()
    val f = fs(lake)
    assert(DeletionVectors.deleteMor(spark, lake, "k < 50") == 50L)
    // two appends on top: batch 4 old (so the mutation generation's
    // whole id-3 group can expire past it), batch 5 fresh
    for (b <- 4 to 5) {
      val before = CommitLog.dataFileNames(f, lake)
      Seq((9000 + b, b.toLong)).toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b.toLong,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    val now = System.currentTimeMillis()
    backdate(lake, f.listStatus(new Path(CommitLog.logDir(lake)))
      .map(_.getPath.getName).toSeq
      .filterNot(n => n.startsWith("5.") || n == "WRITER_LOCK"),
      now - 7L * 86400000L)
    val (expired, _) = CommitLog.retention(f, lake,
      olderThanMs = 86400000L, graceMs = 0L, nowMs = now)
    assert(expired == 5, s"saw $expired") // m0..m3 + the mutation record
    // the fold spells .fold.mutation. — the rewrite stays visible to
    // the version-resolution guards
    assert(f.listStatus(new Path(CommitLog.logDir(lake)))
      .exists(_.getPath.getName.contains(".fold.mutation.")))
    val got = DeletionVectors.readMor(spark, lake)
    assert(got.count() == 352L,
      "the fold must carry dv coverage — dead rows must not resurrect")
    assert(got.filter(col("k") < 50).count() == 0L)
  }
}
