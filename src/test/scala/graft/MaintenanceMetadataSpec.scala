package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{Clone, CommitLog, Constraints, DeletionVectors,
  GeneratedColumns, MergeInto, ZOrder}

/** Table METADATA surviving maintenance rewrites — the r9 advice
  * findings: OPTIMIZE's dir swap must carry definition records (CHECK
  * constraints, generated columns) into the fresh log; the clone-source
  * cache must not serve a pointer the swap destroyed; `compact` must
  * clear dv coverage before deleting sidecars it cannot apply; a second
  * concurrent clone into the same target must fail fast, not tear; and
  * CDC cursor invalidation is a dedicated exception type. */
class MaintenanceMetadataSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A committed 3-file lake: 300 rows, `k` unique, `v = 10 * k`. */
  private def mkLake(prefix: String): String = {
    val lake = Files.createTempDirectory(prefix).toString + "/lake"
    val f = fs(lake)
    (0 until 300).map(k => (k, 10L * k)).toDF("k", "v")
      .repartition(3).write.parquet(lake)
    CommitLog.commit(f, lake, 0L,
      CommitLog.dataFileNames(f, lake).toSeq.sorted)
    lake
  }

  test("OPTIMIZE carries CHECK constraints and generated-column " +
    "definitions across the dir swap, and they keep gating writes") {
    val lake = mkLake("graft_mm_opt_")
    val f = fs(lake)
    Constraints.add(spark, lake, "v_nonneg", "v >= 0")
    // declare v generated as 10 * k (true for every existing row)
    GeneratedColumns.add(spark, lake, "v", "10 * CAST(k AS BIGINT)")
    ZOrder.optimize(spark, lake, Seq("k"), bits = 8, numFiles = 2)
    assert(Constraints.list(f, lake) === Seq(("v_nonneg", "v >= 0")))
    assert(GeneratedColumns.list(f, lake).map(d => (d._1, d._2)) ===
      Seq(("v", "10 * CAST(k AS BIGINT)")))
    // BOTH gates still fire post-OPTIMIZE: a negative v trips the
    // CHECK constraint; a non-negative drifted v trips the generated
    // gate
    intercept[Constraints.ConstraintViolation] {
      MergeInto.merge(spark, lake, Seq((5, -1L)).toDF("k", "v"), Seq("k"))
    }
    intercept[GeneratedColumns.GeneratedColumnViolation] {
      MergeInto.merge(spark, lake, Seq((5, 999L)).toDF("k", "v"), Seq("k"))
    }
    // and an omitted generated column is FILLED, constraint passing
    val upd = Seq(7).toDF("k")
    MergeInto.merge(spark, lake, upd, Seq("k"))
    val got = graft.streaming.LayoutSink.readCommitted(spark, lake)
      .filter(col("k") === 7).select("v").as[Long].head()
    assert(got === 70L)
  }

  test("OPTIMIZE on a shallow clone localizes the bytes and retires " +
    "the source pointer — including the positive cache entry") {
    val lake = mkLake("graft_mm_cl_")
    val branch = new Path(lake).getParent.toString + "/branch"
    val f = fs(lake)
    Clone.shallow(spark, lake, branch)
    assert(Clone.isClone(spark, branch)) // cache now holds a positive
    ZOrder.optimize(spark, branch, Seq("k"), bits = 8, numFiles = 2)
    // the pointer died with the old log dir; the cache must agree
    assert(!Clone.isClone(spark, branch))
    // the branch is self-contained: delete the source, reads still work
    f.delete(new Path(lake), true)
    val n = graft.streaming.LayoutSink.readCommitted(spark, branch).count()
    assert(n === 300L)
  }

  test("compact clears dv coverage before deleting sidecars whose " +
    "pairs name only non-committed files") {
    val lake = mkLake("graft_mm_cp_")
    val f = fs(lake)
    // hand-publish coverage of a sidecar whose pairs name a file the
    // log never committed (the debris shape a crashed rewrite leaves)
    Seq(("nonexistent.parquet", 0L)).toDF("file", "pos")
      .repartition(1).write.parquet(DeletionVectors.dvDir(lake))
    val dvName = f.listStatus(new Path(DeletionVectors.dvDir(lake)))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).head
    val committed = CommitLog.committedNames(f, lake).toSeq.sorted
    CommitLog.commitMutationCheckpoint(f, lake, 0L, committed,
      dvNames = Seq(dvName))
    val (rewritten, carried) = DeletionVectors.compact(spark, lake)
    assert(rewritten === 0 && carried === committed.size)
    // coverage is gone WITH the sidecar — a later read must not chase
    // a covered-but-deleted parquet path
    assert(CommitLog.coveredDvNames(f, lake).isEmpty)
    assert(DeletionVectors.readMor(spark, lake).count() === 300L)
  }

  test("a concurrent shallow clone into a locked target fails fast " +
    "instead of tearing the pointer/bootstrap writes") {
    val lake = mkLake("graft_mm_race_")
    val branch = new Path(lake).getParent.toString + "/branch"
    val f = fs(branch)
    // simulate clone #1 mid-flight: it holds the TARGET's writer lock
    f.mkdirs(new Path(CommitLog.logDir(branch)))
    val lock = new Path(CommitLog.logDir(branch), "WRITER_LOCK")
    val out = f.create(lock, false)
    out.write(s"${System.currentTimeMillis()} test".getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalStateException] {
      Clone.shallow(spark, lake, branch)
    }
    assert(e.getMessage.contains("writer lock"))
    f.delete(lock, false)
    // with the lock released, the clone proceeds normally
    Clone.shallow(spark, lake, branch)
    assert(Clone.isClone(spark, branch))
  }

  test("cursor invalidation after a physical rewrite is the dedicated " +
    "CursorInvalidatedException type") {
    val lake = mkLake("graft_mm_cur_")
    val cur = DeletionVectors.cursor(spark, lake)
    // a CoW delete rewrites files the cursor pinned
    MergeInto.delete(spark, lake, "k % 2 = 0")
    intercept[DeletionVectors.CursorInvalidatedException] {
      DeletionVectors.readMorChanges(spark, lake, cur).count()
    }
  }
}
