package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, DeletionVectors}
import graft.streaming.LayoutSink

/** RESTORE (rollback) + the vacuum retention story around it:
  * `CommitLog.restore(toBatchId)` republishes the as-of view as the
  * table's NEW current version in one metadata-scale checkpoint write
  * — zero data I/O, so a 100 TB rollback costs milliseconds — and the
  * rolled-back batches' files age into `vacuum`'s sweep, which now
  * also reclaims UNCOVERED `_dv` sidecars (crashed-mutation debris /
  * coverage dropped by a later mutation) while never touching a
  * covered one. The exact-checkpoint arm carries `dv:` coverage
  * forward, so deletion vectors travel with the rollback; reclaimed
  * bytes and fold horizons FAIL FAST rather than resurrect a view the
  * disk can no longer serve. Oracle twins: `q76_restore`,
  * `q77_restore_dv`. */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Lake with batches 0..2 committed (100 rows each, `b` = batch id)
    * and one uncommitted orphan file carrying b = 99. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_rs_").toString + "/lake"
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

  test("restore rolls the view back to an append-only id; the next " +
    "writer's batch id stays visible above it") {
    val lake = mkLake()
    val f = fs(lake)
    // publishes AT the current max id (2), NOT maxId+1 — a checkpoint
    // minted at 3 would subsume the manifest a resuming streaming
    // sink's epoch counter commits at 3, silently losing that batch
    val newId = CommitLog.restore(f, lake, toBatchId = 1L)
    assert(newId == 2L, s"restore published at $newId")
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.count() == 200)
    assert(got.agg(max(col("b"))).head.getInt(0) == 1)
    // the rolled-back batch's file is still on disk (retention is
    // vacuum's job, not restore's) but invisible to the view
    assert(spark.read.parquet(lake).filter(col("b") === 2).count() == 100)
    // appends continue above the restore id
    val before = CommitLog.dataFileNames(f, lake)
    Seq((4, 4000)).toDF("b", "v").coalesce(1).write.mode("append")
      .parquet(lake)
    CommitLog.commit(f, lake, newId + 1,
      (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    val after = LayoutSink.readCommitted(spark, lake)
    assert(after.count() == 201)
    assert(after.agg(max(col("b"))).head.getInt(0) == 4)
  }

  test("restore is idempotent under replay: a repeat targeting the " +
    "restored content republishes the same view") {
    val lake = mkLake()
    val f = fs(lake)
    val id1 = CommitLog.restore(f, lake, toBatchId = 1L)
    // the restore checkpoint's own id is an exact record — a crashed
    // caller can re-target it and get the identical view republished
    // at a fresh generation of the same id
    val id2 = CommitLog.restore(f, lake, toBatchId = id1)
    assert(id2 == id1)
    assert(LayoutSink.readCommitted(spark, lake).count() == 200)
  }

  test("vacuum sweeps the rolled-back files after restore — the " +
    "retention window is olderThanMs — and the view never moves") {
    val lake = mkLake()
    val f = fs(lake)
    CommitLog.restore(f, lake, toBatchId = 1L)
    // inside the horizon: rolled-back bytes are still recoverable
    assert(CommitLog.vacuum(f, lake, olderThanMs = 3600000L).isEmpty)
    // past it: batch-2's file AND the crash orphan go
    val swept = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept.size == 2, s"swept $swept")
    assert(spark.read.parquet(lake).count() == 200)
    assert(LayoutSink.readCommitted(spark, lake).count() == 200)
  }

  test("restore to a mutation checkpoint's exact id carries " +
    "deletion-vector coverage forward; vacuum spares the covered " +
    "sidecar while sweeping the junk batch") {
    val lake = mkLake()
    val f = fs(lake)
    val marked = DeletionVectors.deleteMor(spark, lake, "v % 10 = 0")
    assert(marked > 0)
    val mutId = CommitLog.maxCommittedId(f, lake) // published AT max id
    val expected = DeletionVectors.readMor(spark, lake)
      .agg(sum(col("v"))).head.getLong(0)
    // a junk batch lands committed above the mutation …
    val before = CommitLog.dataFileNames(f, lake)
    (0 until 50).map(i => (7, 7000 + i)).toDF("b", "v")
      .coalesce(1).write.mode("append").parquet(lake)
    CommitLog.commit(f, lake, mutId + 1,
      (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    // … and restore rolls back to the mutation's published view
    CommitLog.restore(f, lake, toBatchId = mutId)
    assert(DeletionVectors.hasDvs(f, lake),
      "restore dropped the dv coverage")
    val swept = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept.nonEmpty && !swept.exists(_.startsWith("_dv/")),
      s"vacuum touched a covered sidecar: $swept")
    val got = DeletionVectors.readMor(spark, lake)
    assert(got.filter(col("b") === 7).count() == 0, "junk survived")
    assert(got.filter(col("v") % 10 === 0).count() == 0,
      "restore resurrected MoR-deleted rows")
    assert(got.agg(sum(col("v"))).head.getLong(0) == expected)
  }

  test("vacuum reclaims an UNCOVERED sidecar past the horizon — " +
    "crashed-mutation debris — and spares it inside the horizon") {
    val lake = mkLake()
    val f = fs(lake)
    DeletionVectors.deleteMor(spark, lake, "v % 10 = 0")
    // plant debris: a sidecar no checkpoint covers
    val debris = new Path(DeletionVectors.dvDir(lake),
      "part-99999-debris.parquet")
    val out = f.create(debris, true)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    assert(CommitLog.vacuum(f, lake, olderThanMs = 3600000L).isEmpty)
    val swept = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept.contains("_dv/part-99999-debris.parquet"),
      s"debris not swept: $swept")
    assert(DeletionVectors.hasDvs(f, lake),
      "vacuum ate the covered sidecar")
    assert(DeletionVectors.readMor(spark, lake)
      .filter(col("v") % 10 === 0).count() == 0)
  }

  test("restore fails fast past the fold horizon, on unknown ids, " +
    "and when the disk can no longer serve the view") {
    val lake = mkLake()
    val f = fs(lake)
    CommitLog.checkpoint(f, lake) // folds everything into id 2
    val e1 = intercept[IllegalArgumentException] {
      CommitLog.restore(f, lake, toBatchId = 1L)
    }
    assert(e1.getMessage.contains("history truncated"))
    val e2 = intercept[IllegalArgumentException] {
      CommitLog.restore(f, lake, toBatchId = 9L)
    }
    assert(e2.getMessage.contains("only reaches"))
    // reclaimed bytes: delete a committed file behind the log's back
    val victim = CommitLog.committedNames(f, lake).head
    f.delete(new Path(lake, victim), false)
    val e3 = intercept[IllegalArgumentException] {
      CommitLog.restore(f, lake, toBatchId = 2L)
    }
    assert(e3.getMessage.contains("reclaimed"))
  }

  test("history describes the live log: kinds, file counts, the " +
    "current view and restore reachability") {
    val lake = mkLake()
    val f = fs(lake)
    val h0 = CommitLog.history(f, lake)
    assert(h0.map(r => (r.id, r.kind)) ==
      Seq((0L, "manifest"), (1L, "manifest"), (2L, "manifest")))
    assert(h0.forall(r => r.current && r.reachable && r.dvFiles == 0))
    assert(h0.map(_.dataFiles) == Seq(1, 1, 1))
    // a MoR delete publishes a mutation snapshot AT the max id: the
    // manifests fall out of the current view, the mutation record
    // carries the full file list + its sidecar
    DeletionVectors.deleteMor(spark, lake, "v % 10 = 0")
    val h1 = CommitLog.history(f, lake)
    val mut = h1.find(_.kind == "mutation").get
    assert(mut.id == 2L && mut.current && mut.reachable)
    assert(mut.dataFiles == 3 && mut.dvFiles == 1)
    // r10 versioned log: the manifests fall out of the CURRENT view,
    // but a DML mutation sweeps nothing, so they stay REACHABLE —
    // time travel and restore resolve through the mutation record
    assert(h1.filter(_.kind == "manifest").forall(r =>
      !r.current && r.reachable))
    // an append above the mutation is current and reachable
    val before = CommitLog.dataFileNames(f, lake)
    Seq((3, 3000)).toDF("b", "v").coalesce(1).write.mode("append")
      .parquet(lake)
    CommitLog.commit(f, lake, 3L,
      (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    val h2 = CommitLog.history(f, lake)
    assert(h2.exists(r => r.id == 3L && r.kind == "manifest" &&
      r.current && r.reachable))
  }

  test("a change cursor from before the restore fails fast — the " +
    "rollback is a mutation, not an append") {
    val lake = mkLake()
    val f = fs(lake)
    CommitLog.restore(f, lake, toBatchId = 1L)
    val e = intercept[IllegalArgumentException] {
      CommitLog.changedNames(f, lake, 0L, 3L)
    }
    assert(e.getMessage.contains("mutation"))
  }
}
