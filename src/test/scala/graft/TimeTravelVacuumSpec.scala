package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.CommitLog
import graft.streaming.LayoutSink

/** Commit-log time travel + vacuum: `readCommittedAt(asOf)` is the
  * lake exactly as a reader between batch `asOf` and `asOf+1` saw it
  * (later batches and crash orphans invisible); travel past the
  * checkpoint-fold horizon FAILS FAST instead of answering from a
  * partial log; `vacuum` sweeps only aged uncommitted files, so
  * neither the present view nor any reachable as-of view moves. */
class TimeTravelVacuumSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Lake with batches 0..2 committed (100 rows each, `b` = batch id)
    * and one uncommitted orphan file carrying b = 99. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_tt_").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(i => (b, b * 1000 + i)).toDF("b", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    Seq((99, -1)).toDF("b", "v").coalesce(1).write.mode("append")
      .parquet(lake)
    lake
  }

  test("as-of reads see exactly the batches <= asOf; orphans and " +
    "later batches are invisible") {
    val lake = mkLake()
    for (asOf <- 0 to 2) {
      val got = LayoutSink.readCommittedAt(spark, lake, asOf)
      assert(got.count() == (asOf + 1) * 100, s"asOf=$asOf")
      assert(got.agg(max(col("b"))).head.getInt(0) == asOf, s"asOf=$asOf")
    }
    // present view == as-of newest; both exclude the orphan
    val present = LayoutSink.readCommitted(spark, lake)
    assert(present.count() == 300)
    assert(present.filter(col("b") === 99).count() == 0)
    // before any batch: empty, schema-stable
    assert(LayoutSink.readCommittedAt(spark, lake, -1L).count() == 0)
  }

  test("travel past the checkpoint-fold horizon fails fast; the " +
    "folded id itself stays readable") {
    val lake = mkLake()
    val f = fs(lake)
    CommitLog.checkpoint(f, lake) // folds everything into id 2
    // the snapshot id is still a sound view …
    assert(LayoutSink.readCommittedAt(spark, lake, 2L).count() == 300)
    // … but ids below it are history the fold deleted
    val e = intercept[IllegalArgumentException] {
      CommitLog.committedNamesAt(f, lake, 1L)
    }
    assert(e.getMessage.contains("history truncated"))
  }

  test("vacuum sweeps aged orphans only: committed files and " +
    "in-horizon fresh files survive, and as-of views do not move") {
    val lake = mkLake()
    val f = fs(lake)
    val asOf1Before = LayoutSink.readCommittedAt(spark, lake, 1L)
      .agg(sum(col("v"))).head.getLong(0)
    // a generous horizon spares the just-written orphan
    assert(CommitLog.vacuum(f, lake, olderThanMs = 3600000L).isEmpty)
    assert(spark.read.parquet(lake).filter(col("b") === 99).count() == 1)
    // horizon 0 sweeps it — and nothing else
    val swept = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept.size == 1, s"swept $swept")
    assert(spark.read.parquet(lake).count() == 300)
    assert(CommitLog.vacuum(f, lake, olderThanMs = 0L).isEmpty)
    // every committed file is still present; time travel unchanged
    val asOf1After = LayoutSink.readCommittedAt(spark, lake, 1L)
      .agg(sum(col("v"))).head.getLong(0)
    assert(asOf1After == asOf1Before)
  }

  test("readChanges returns exactly the delta batches added; " +
    "attribution loss fails fast after a fold") {
    val lake = mkLake()
    val f = fs(lake)
    // (-1, 0] = batch 0 only; (0, 2] = batches 1 and 2; orphan never
    val d0 = LayoutSink.readChanges(spark, lake, -1L, 0L)
    assert(d0.count() == 100 && d0.agg(max(col("b"))).head.getInt(0) == 0)
    val d12 = LayoutSink.readChanges(spark, lake, 0L, 2L)
    assert(d12.count() == 200)
    assert(d12.select(col("b")).distinct().as[Int].collect().sorted
      .sameElements(Array(1, 2)))
    // empty delta beyond the head: schema-stable zero rows
    assert(LayoutSink.readChanges(spark, lake, 2L, 5L).count() == 0)
    // a fold past `from` destroys per-batch attribution — fail fast
    CommitLog.checkpoint(f, lake)
    val e = intercept[IllegalArgumentException] {
      CommitLog.changedNames(f, lake, 0L, 2L)
    }
    assert(e.getMessage.contains("history truncated"))
  }

  test("a tampered record with a path-escaping entry is rejected, " +
    "not resolved outside the lake") {
    val lake = mkLake()
    val f = fs(lake)
    val evil = new Path(CommitLog.logDir(lake), "7.manifest")
    val out = f.create(evil, true)
    try out.write("../outside.parquet\n".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException] {
      CommitLog.committedNames(f, lake)
    }
    assert(e.getMessage.contains("path-escaping"))
  }

  test("vacuum no-ops on a lake without a commit log") {
    val dir = Files.createTempDirectory("graft_tt_plain_").toString
    Seq((1, 2)).toDF("b", "v").write.parquet(s"$dir/lake")
    assert(CommitLog.vacuum(fs(s"$dir/lake"), s"$dir/lake", 0L).isEmpty)
    assert(spark.read.parquet(s"$dir/lake").count() == 1)
  }
}
