package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, DeletionVectors, MergeInto, ZOrder}
import graft.streaming.LayoutSink

/** Merge-on-read deletes: vectors mark rows without rewriting files,
  * readMor applies them exactly, compact applies them physically, and
  * every copy-on-write rewriter refuses to run over unapplied vectors
  * (it would resurrect the deleted rows). */
class DeletionVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batches 0..2, one file each: k unique 0-99 / 1000-1099 / 2000-2099. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_dv_").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(b * 1000 + _).map(k => (k, k.toLong * 2))
        .toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    lake
  }

  test("deleteMor marks without rewriting; readMor equals the CoW " +
    "complement; repeats are idempotent; vectors compose across calls") {
    val lake = mkLake()
    val f = fs(lake)
    val filesBefore = CommitLog.committedNames(f, lake)
    val n = DeletionVectors.deleteMor(spark, lake, "k % 10 = 3")
    assert(n == 30L, s"marked $n")
    // ZERO data files changed — that is the merge-on-read contract
    assert(CommitLog.committedNames(f, lake) == filesBefore,
      "deleteMor must not rewrite data files")
    val got = DeletionVectors.readMor(spark, lake)
      .orderBy("k").select("k").as[Int].collect().toSeq
    val want = (0 until 100) ++ (1000 until 1100) ++ (2000 until 2100)
    assert(got == want.filterNot(_ % 10 == 3), "readMor row set")
    // same predicate again: nothing new to mark
    assert(DeletionVectors.deleteMor(spark, lake, "k % 10 = 3") == 0L)
    // a second, overlapping predicate composes (only NEW pairs count)
    val n2 = DeletionVectors.deleteMor(spark, lake, "k % 5 = 3")
    assert(n2 == 30L, s"second delete marked $n2") // %5=3 minus %10=3
    assert(DeletionVectors.readMor(spark, lake).count() == 240L)
  }

  test("physical rewriters fail fast over unapplied vectors; appends " +
    "compose; vacuum never sweeps the sidecar") {
    val lake = mkLake()
    val f = fs(lake)
    DeletionVectors.deleteMor(spark, lake, "k < 50")
    def rejects(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    }
    rejects(MergeInto.delete(spark, lake, "k < 10"))
    rejects(MergeInto.update(spark, lake, "k = 60", Map("v" -> "0")))
    rejects(MergeInto.merge(spark, lake,
      Seq((60, 0L)).toDF("k", "v"), Seq("k")))
    rejects(ZOrder.optimize(spark, lake, Seq("k"), numFiles = 2))
    rejects(ZOrder.compactSmall(spark, lake,
      Seq("k"), minBytes = 1 << 20))
    // an ingest APPEND is fine — new files carry no vectors
    val before = CommitLog.dataFileNames(f, lake)
    (9000 until 9010).map(k => (k, k.toLong)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(lake)
    CommitLog.commit(f, lake, 3,
      (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    assert(DeletionVectors.readMor(spark, lake).count() == 260L)
    // vacuum sweeps orphans, never the _dv sidecar
    CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(DeletionVectors.hasDvs(f, lake), "vacuum ate the sidecar")
    assert(DeletionVectors.readMor(spark, lake).count() == 260L)
  }

  test("compact applies the vectors physically — only DV'd files " +
    "rewrite, the view is unchanged, CoW unblocks — and clears stale " +
    "vectors on rerun") {
    val lake = mkLake()
    val f = fs(lake)
    // vectors confined to batch-0's and batch-1's files
    DeletionVectors.deleteMor(spark, lake, "k < 20 OR k BETWEEN 1000 AND 1009")
    val viewBefore = DeletionVectors.readMor(spark, lake)
      .orderBy("k").collect().toSeq
    val (rw, carried) = DeletionVectors.compact(spark, lake)
    assert(rw == 2 && carried == 1, s"compact ($rw, $carried)")
    assert(!DeletionVectors.hasDvs(f, lake), "sidecar must be gone")
    // the PLAIN committed read now equals the pre-compact MoR view
    assert(LayoutSink.readCommitted(spark, lake)
      .orderBy("k").collect().toSeq == viewBefore)
    // readMor without vectors is the plain read
    assert(DeletionVectors.readMor(spark, lake)
      .orderBy("k").collect().toSeq == viewBefore)
    // CoW works again
    val (rw2, _) = MergeInto.delete(spark, lake, "k = 2000")
    assert(rw2 == 1)
    // stale vectors (a crashed compact's leftover, referencing a
    // swept file) read as no-ops and a compact rerun just clears them
    Seq(("no-such-file.parquet", 0L)).toDF("file", "pos")
      .write.parquet(DeletionVectors.dvDir(lake))
    assert(DeletionVectors.readMor(spark, lake).count() ==
      viewBefore.size - 1L)
    val (rw3, _) = DeletionVectors.compact(spark, lake)
    assert(rw3 == 0 && !DeletionVectors.hasDvs(f, lake))
  }

  test("readMorPruned composes file skipping with vectors: pruned ∧ " +
    "DV-applied equals the filtered MoR view, and skipping is real") {
    import graft.sources.StatsIndex
    val lake = mkLake() // 3 range-disjoint files: 0-99/1000-1099/2000-2099
    val idx = lake.stripSuffix("/lake") + "/idx"
    StatsIndex.build(spark, lake, Seq("k"), idx)
    DeletionVectors.deleteMor(spark, lake, "k % 10 = 3")
    val ranges = Seq(StatsIndex.LongRange("k", 1000L, 1099L))
    val got = DeletionVectors
      .readMorPruned(spark, lake, idx, ranges)
      .orderBy("k").select("k").as[Int].collect().toSeq
    val want = DeletionVectors.readMor(spark, lake)
      .filter(col("k").between(1000, 1099))
      .orderBy("k").select("k").as[Int].collect().toSeq
    assert(got == want && got.size == 90, s"pruned MoR ${got.size}")
    // the prune is real: only one of three files can match the band
    assert(StatsIndex.prunedTyped(spark, idx, ranges).size == 1)
    // empty prune result: typed-empty frame, no vectors applied
    assert(DeletionVectors.readMorPruned(spark, lake, idx,
      Seq(StatsIndex.LongRange("k", 500000L, 500001L))).count() == 0L)
  }

  test("a DV delete is a MUTATION in the history surface: snapshot " +
    "reads at or before its id fail fast") {
    val lake = mkLake()
    // pre-mutation snapshot works
    assert(LayoutSink.readCommittedAt(spark, lake, asOf = 1L)
      .count() == 200L)
    DeletionVectors.deleteMor(spark, lake, "k < 10")
    val e = intercept[IllegalArgumentException](
      LayoutSink.readCommittedAt(spark, lake, asOf = 1L).count())
    // either fail-fast arm is correct: the DV publish is a mutation
    // checkpoint, so the as-of read dies on the mutation flag or on
    // the records it folded — never serves post-delete content as a
    // pre-delete snapshot
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("mutation") || msg.contains("truncated"), msg)
  }
}
