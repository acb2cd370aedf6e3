package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, DeletionVectors, Occ}
import graft.streaming.ChangeStream

/** CDC streaming source ([[graft.streaming.ChangeStream]]): pinned
  * per-window delivery, checkpointed restart resume, and the TYPED
  * guard trip when a physical rewrite invalidates row-level tracking
  * mid-stream. Oracle twin: `qs20_stream_cdc`. */
class ChangeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkLake(): (String, String) = {
    val dir = Files.createTempDirectory("graft_cstream_").toString
    val lake = s"$dir/lake"
    val f = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 100).map(k => (k.toLong, 10L * k)).toDF("k", "v")
      .coalesce(1).write.parquet(lake)
    CommitLog.commit(f, lake, 0L,
      CommitLog.dataFileNames(f, lake).toSeq.sorted)
    (lake, s"$dir/ckp")
  }

  /** Thread-safe feed recorder: (change type, k, v). */
  private def recorder(): (ArrayBuffer[(String, Long, Long)],
      (org.apache.spark.sql.DataFrame, Long) => Unit) = {
    val buf = ArrayBuffer.empty[(String, Long, Long)]
    val on = (df: org.apache.spark.sql.DataFrame, _: Long) => {
      val rows = df.select(col("_change_type"), col("k"), col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      buf.synchronized { buf ++= rows; () }
    }
    (buf, on)
  }

  test("live windows: an append arrives as inserts, a MoR delete as " +
    "deletes with the old values — each drained window whole") {
    val (lake, ckp) = mkLake()
    val (buf, on) = recorder()
    val q = ChangeStream.start(spark, lake, ckp, pollMs = 20L)(on)
    try {
      assert(Occ.append(spark, lake,
        Seq((1000L, -1L), (1001L, -2L)).toDF("k", "v")) > 0L)
      q.processAllAvailable()
      assert(buf.synchronized(buf.toSet) ==
        Set(("insert", 1000L, -1L), ("insert", 1001L, -2L)))
      assert(DeletionVectors.deleteMor(spark, lake, "k = 7") == 1L)
      q.processAllAvailable()
      assert(buf.synchronized(buf.toSet).contains(("delete", 7L, 70L)),
        "the delete must carry the OLD row values")
      assert(q.batchesProcessed == 2L)
    } finally q.stop()
    assert(q.exception.isEmpty)
  }

  test("restart resumes from the checkpoint: the offline window is " +
    "served exactly once, nothing before it re-served") {
    val (lake, ckp) = mkLake()
    val (buf1, on1) = recorder()
    val q1 = ChangeStream.start(spark, lake, ckp, pollMs = 20L,
      initialSnapshot = true)(on1)
    try {
      q1.processAllAvailable()
      assert(buf1.synchronized(buf1.size) == 100,
        "initial snapshot = the whole current version as inserts")
    } finally q1.stop()
    // mutations while the stream is DOWN
    assert(DeletionVectors.deleteMor(spark, lake, "k < 5") == 5L)
    assert(Occ.append(spark, lake,
      Seq((2000L, 9L)).toDF("k", "v")) > 0L)
    val (buf2, on2) = recorder()
    // initialSnapshot is ignored on restart — the checkpoint wins
    val q2 = ChangeStream.start(spark, lake, ckp, pollMs = 20L,
      initialSnapshot = true)(on2)
    try {
      q2.processAllAvailable()
      val got = buf2.synchronized(buf2.toSet)
      assert(got == (0 until 5).map(k =>
        ("delete", k.toLong, 10L * k)).toSet + (("insert", 2000L, 9L)),
        s"offline window must arrive exactly once, saw $got")
    } finally q2.stop()
  }

  test("the feed speaks LOGICAL names: a rename lands in every " +
    "subsequent window's schema, and the values keep flowing") {
    val (lake, ckp) = mkLake()
    val schemas = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val vals = ArrayBuffer.empty[(String, Long, Long)]
    val q = ChangeStream.start(spark, lake, ckp, pollMs = 20L) {
      (df, _) =>
        val cols = df.columns.toSeq.sorted
        val valueCol = if (cols.contains("value")) "value" else "v"
        val rows = df.select(col("_change_type"), col("k"),
          col(valueCol)).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        vals.synchronized { schemas += cols; vals ++= rows; () }
    }
    try {
      assert(Occ.append(spark, lake,
        Seq((500L, 5L)).toDF("k", "v")) > 0L)
      q.processAllAvailable()
      graft.sources.ColumnMapping.rename(spark, lake, "v", "value")
      // post-rename: a logical-name append + a MoR delete — both
      // windows must surface the LOGICAL column
      assert(Occ.append(spark, lake,
        Seq((600L, 6L)).toDF("k", "value")) > 0L)
      assert(DeletionVectors.deleteMor(spark, lake, "k = 3") == 1L)
      q.processAllAvailable()
    } finally q.stop()
    assert(q.exception.isEmpty, q.exception.toString)
    val (ss, vv) = vals.synchronized { (schemas.toList, vals.toSet) }
    assert(ss.head.contains("v") && !ss.head.contains("value"),
      s"pre-rename window under the old name: ${ss.head}")
    assert(ss.last.contains("value") && !ss.last.contains("v"),
      s"post-rename windows under the new name: ${ss.last}")
    assert(vv == Set(("insert", 500L, 5L), ("insert", 600L, 6L),
      ("delete", 3L, 30L)), s"saw $vv")
  }

  test("a mid-stream physical rewrite (compact) trips the TYPED " +
    "cursor guard: the query terminates and awaitTermination " +
    "rethrows CursorInvalidatedException") {
    val (lake, ckp) = mkLake()
    val (_, on) = recorder()
    val q = ChangeStream.start(spark, lake, ckp, pollMs = 20L)(on)
    assert(DeletionVectors.deleteMor(spark, lake, "k < 10") == 10L)
    q.processAllAvailable()
    // the rewrite: compact applies the vectors physically — row-level
    // tracking across it is unsound, the stream must DIE loudly
    DeletionVectors.compact(spark, lake)
    assert(Occ.append(spark, lake, Seq((3000L, 1L)).toDF("k", "v")) >= 0L)
    val e = intercept[DeletionVectors.CursorInvalidatedException] {
      q.awaitTermination(timeoutMs = 60000L)
    }
    assert(e.getMessage.contains("resync"), e.getMessage)
    assert(!q.isActive)
    assert(q.exception.exists(
      _.isInstanceOf[DeletionVectors.CursorInvalidatedException]))
  }
}
