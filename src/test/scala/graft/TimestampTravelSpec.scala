package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.CommitLog
import graft.streaming.LayoutSink

/** TIMESTAMP AS OF ([[graft.sources.CommitLog.committedViewAtTime]]):
  * newest version published at-or-before the instant wins; instants
  * before the first LIVE record are loud (pre-lake and expired
  * history are indistinguishable and must never read as empty); a
  * same-instant restore outranks its manifest in publish order.
  * Oracle twin: `q86_time_travel_ts`. */
class TimestampTravelSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val T = 1700000000000L

  /** Batches 0..3 (100 rows each), record b pinned to T + 1000·b. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_tst_").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 3) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(i => (100 * b + i, b.toLong)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
      f.setTimes(new Path(CommitLog.logDir(lake), s"$b.manifest"),
        T + 1000L * b, -1)
    }
    lake
  }

  test("newest at-or-before wins at every boundary; before the first " +
    "live record is loud") {
    val lake = mkLake()
    for (b <- 0 to 3) {
      // exactly AT a record's instant: that record serves
      assert(LayoutSink.readCommittedAtTime(spark, lake, T + 1000L * b)
        .count() == 100L * (b + 1))
      // just before the NEXT record: still this one
      assert(LayoutSink.readCommittedAtTime(spark, lake,
        T + 1000L * b + 999L).count() == 100L * (b + 1))
    }
    val e = intercept[IllegalArgumentException] {
      LayoutSink.readCommittedAtTime(spark, lake, T - 1L)
    }
    assert(e.getMessage.contains("before the first live record"),
      e.getMessage)
  }

  test("after retention expires old versions, their instants are loud " +
    "— never an empty or wrong view") {
    val lake = mkLake()
    val f = fs(lake)
    // expire versions 0 and 1 (superseded before T + 2000)
    val (expired, _) = CommitLog.retention(f, lake,
      olderThanMs = 1000L, graceMs = 0L, nowMs = T + 3000L)
    assert(expired == 2, s"saw $expired")
    val e = intercept[IllegalArgumentException] {
      LayoutSink.readCommittedAtTime(spark, lake, T + 500L)
    }
    assert(e.getMessage.contains("expired") ||
      e.getMessage.contains("truncated"), e.getMessage)
    // newer instants still resolve exactly (the fold carries v1's
    // view at its own publish time — the boundary base; v2/v3 intact)
    assert(LayoutSink.readCommittedAtTime(spark, lake, T + 2500L)
      .count() == 300L)
    assert(LayoutSink.readCommittedAtTime(spark, lake, T + 9999L)
      .count() == 400L)
  }

  test("a same-instant RESTORE outranks its manifest: publish order " +
    "is (id, manifest < checkpoint, gen), not kind lexicography") {
    val lake = mkLake()
    val f = fs(lake)
    CommitLog.restore(f, lake, toBatchId = 1L) // ckpt at id 3, view@1
    // pin the restore checkpoint to EXACTLY batch 3's instant
    f.listStatus(new Path(CommitLog.logDir(lake)))
      .filter(_.getPath.getName.endsWith(".checkpoint"))
      .foreach(st => f.setTimes(st.getPath, T + 3000L, -1))
    val got = LayoutSink.readCommittedAtTime(spark, lake, T + 3000L)
    assert(got.count() == 200L,
      "the restore (published after the manifest) must win the tie")
    assert(got.filter(col("v") >= 2L).count() == 0L)
  }
}
