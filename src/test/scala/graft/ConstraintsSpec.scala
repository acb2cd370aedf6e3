package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, Constraints, DeletionVectors, MergeInto}
import graft.streaming.LayoutSink

/** CHECK constraints gate every verb that introduces NEW rows into a
  * committed lake — ingest batches, CoW merge/update rewrites, MoR
  * delta files — BEFORE the publish, so a violating write throws and
  * leaves the table untouched (its files are unreferenced debris
  * vacuum sweeps). Semantics are SQL CHECK: only strictly-FALSE rows
  * violate (NULL passes), so nullable columns and pre-evolution
  * batches compose without special cases. Deletes, compaction,
  * OPTIMIZE and restore skip the gate: existing rows passed when they
  * entered, by induction — `add` enforces the induction base by
  * scanning the live view. Oracle twin: `q78_constraints`. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed single-batch lake of (k, v) rows with v = k % 100. */
  private def mkLake(n: Int = 1000): String = {
    val lake = Files.createTempDirectory("graft_ck_").toString + "/lake"
    val f = fs(lake)
    (0 until n).map(i => (i.toLong, (i % 100).toLong)).toDF("k", "v")
      .coalesce(2).write.parquet(lake)
    CommitLog.commit(f, lake, 0L,
      CommitLog.dataFileNames(f, lake).toSeq.sorted)
    lake
  }

  test("add validates existing rows (induction base): a clean lake " +
    "accepts, a violating lake rejects naming sample rows; drop " +
    "removes enforcement") {
    val lake = mkLake()
    Constraints.add(spark, lake, "v_small", "v < 100")
    assert(Constraints.list(fs(lake), lake).map(_._1) == Seq("v_small"))
    val e = intercept[Constraints.ConstraintViolation] {
      Constraints.add(spark, lake, "v_tiny", "v < 50")
    }
    assert(e.name == "v_tiny" && e.samples.nonEmpty)
    // the failed add defined nothing
    assert(Constraints.list(fs(lake), lake).map(_._1) == Seq("v_small"))
    Constraints.drop(spark, lake, "v_small")
    assert(Constraints.list(fs(lake), lake).isEmpty)
    // dropped: the once-rejected definition's shape now ingests freely
    val before = CommitLog.dataFileNames(fs(lake), lake)
    Seq((9000L, 99L)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(lake)
    CommitLog.commit(fs(lake), lake, 1L,
      (CommitLog.dataFileNames(fs(lake), lake) -- before).toSeq.sorted)
    assert(LayoutSink.readCommitted(spark, lake).count() == 1001)
  }

  test("a violating ingest batch throws BEFORE commit: the view is " +
    "untouched, the files are sweepable debris, and the corrected " +
    "batch replays onto a clean lake") {
    val dir = Files.createTempDirectory("graft_cki_").toString
    val lake = s"$dir/lake"
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("x"),
        bits = 8, filesPerBatch = 2, curve = "morton")
    process((0 until 500).map(i => (i.toLong, i.toLong))
      .toDF("x", "payload"), 0)
    Constraints.add(spark, lake, "payload_nonneg", "payload >= 0")
    val e = intercept[Constraints.ConstraintViolation] {
      process((500 until 600).map(i => (i.toLong, -i.toLong))
        .toDF("x", "payload"), 1)
    }
    assert(e.name == "payload_nonneg")
    assert(LayoutSink.readCommitted(spark, lake).count() == 500)
    // the rejected files are on disk but invisible; the next attempt's
    // own horizon-0 vacuum clears them before writing
    process((500 until 600).map(i => (i.toLong, i.toLong))
      .toDF("x", "payload"), 1)
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.count() == 600)
    assert(got.agg(min(col("payload"))).head.getLong(0) == 0L)
  }

  test("CoW merge and update gate their rewritten files; delete " +
    "skips the gate (no new values)") {
    val lake = mkLake()
    Constraints.add(spark, lake, "v_bounded", "v < 1000")
    val bad = Seq((3L, 5000L), (9999L, 1L)).toDF("k", "v")
    intercept[Constraints.ConstraintViolation] {
      MergeInto.merge(spark, lake, bad, Seq("k"))
    }
    val view = LayoutSink.readCommitted(spark, lake)
    assert(view.count() == 1000 &&
      view.agg(max(col("v"))).head.getLong(0) == 99L)
    // valid merge lands (update + insert)
    MergeInto.merge(spark, lake,
      Seq((3L, 500L), (9999L, 1L)).toDF("k", "v"), Seq("k"))
    assert(LayoutSink.readCommitted(spark, lake).count() == 1001)
    intercept[Constraints.ConstraintViolation] {
      MergeInto.update(spark, lake, "k = 5", Map("v" -> "v + 10000"))
    }
    assert(LayoutSink.readCommitted(spark, lake)
      .filter(col("k") === 5).head.getLong(1) == 5L)
    // delete needs no validation and succeeds under constraints
    MergeInto.delete(spark, lake, "k >= 900 AND k < 1000")
    assert(LayoutSink.readCommitted(spark, lake).count() == 901)
  }

  test("MoR mergeMor/updateMor gate their delta files: a rejected " +
    "upsert leaves no trace in readMor, sidecar pairs uncovered") {
    val lake = mkLake()
    Constraints.add(spark, lake, "v_bounded", "v < 1000")
    intercept[Constraints.ConstraintViolation] {
      DeletionVectors.mergeMor(spark, lake,
        Seq((3L, 5000L)).toDF("k", "v"), Seq("k"))
    }
    assert(!DeletionVectors.hasDvs(fs(lake), lake),
      "rejected mergeMor left covered vectors")
    val view = DeletionVectors.readMor(spark, lake)
    assert(view.count() == 1000 &&
      view.agg(max(col("v"))).head.getLong(0) == 99L)
    DeletionVectors.mergeMor(spark, lake,
      Seq((3L, 500L)).toDF("k", "v"), Seq("k"))
    assert(DeletionVectors.readMor(spark, lake)
      .filter(col("k") === 3).head.getLong(1) == 500L)
    intercept[Constraints.ConstraintViolation] {
      DeletionVectors.updateMor(spark, lake, "k = 5",
        Map("v" -> "v + 10000"))
    }
    assert(DeletionVectors.readMor(spark, lake)
      .filter(col("k") === 5).head.getLong(1) == 5L)
  }

  test("SQL CHECK NULL semantics: UNKNOWN passes — nullable values " +
    "and pre-evolution batches (column absent from the files) both " +
    "ingest under a constraint on the column") {
    val dir = Files.createTempDirectory("graft_ckn_").toString
    val lake = s"$dir/lake"
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("x"),
        bits = 8, filesPerBatch = 1, curve = "morton")
    process(Seq((1L, Some(5L)), (2L, None)).toDF("x", "extra"), 0)
    Constraints.add(spark, lake, "extra_pos", "extra > 0")
    // NULL `extra` is UNKNOWN, not FALSE — passes
    process(Seq((3L, Option.empty[Long])).toDF("x", "extra"), 1)
    // a batch whose files don't carry the column at all: every value
    // NULL after evolution — the gate must pass it, not crash on
    // non-resolution
    process(Seq(Tuple1(4L)).toDF("x"), 2)
    assert(LayoutSink.readCommitted(spark, lake, mergeSchema = true)
      .count() == 4)
    // a strictly-false value still rejects
    intercept[Constraints.ConstraintViolation] {
      process(Seq((5L, Some(-1L))).toDF("x", "extra"), 3)
    }
  }

  test("duplicate names and malformed definitions fail fast") {
    val lake = mkLake()
    Constraints.add(spark, lake, "a", "v >= 0")
    intercept[IllegalArgumentException] {
      Constraints.add(spark, lake, "a", "v >= 1")
    }
    intercept[IllegalArgumentException] {
      Constraints.add(spark, lake, "bad\tname", "v >= 0")
    }
  }
}
