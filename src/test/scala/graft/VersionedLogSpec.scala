package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{Clone, CommitLog, DeletionVectors, MergeInto}
import graft.streaming.LayoutSink

/** The r10 VERSIONED LOG: time travel, restore, and CLONE AS OF reach
  * ACROSS DML mutation checkpoints. A DML record (`.mutation.`) never
  * sweeps the records below it, so every earlier version stays
  * reconstructable — only a truncating fold (`.checkpoint` /
  * `.fold.mutation.`) or reclaimed bytes end the reach, both loud.
  * Mutation checkpoints carry per-commit `add:`/`rm:` deltas
  * (`history()` churn counts). Oracle twin: `q81_time_travel_dml`. */
class VersionedLogSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batches 0..2 committed: k unique 0..299, b = k/100, v = 10k. */
  private def mkLake(): String = {
    val lake = Files.createTempDirectory("graft_vl_").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 2) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 100).map(i => (b * 100 + i, b, 10L * (b * 100 + i)))
        .toDF("k", "b", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    lake
  }

  private def append(lake: String, id: Long, rows: Seq[(Int, Int, Long)])
      : Unit = {
    val f = fs(lake)
    val before = CommitLog.dataFileNames(f, lake)
    rows.toDF("k", "b", "v").coalesce(1).write.mode("append").parquet(lake)
    CommitLog.commit(f, lake, id,
      (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
  }

  test("append → MoR MERGE → append → MoR DELETE: every version stays " +
    "addressable — bare names below the mutations, as-published views " +
    "at and between them") {
    val lake = mkLake()
    val f = fs(lake)
    // MERGE at id 2 (the current max): k < 10 → v = -1
    DeletionVectors.mergeMor(spark, lake,
      (0 until 10).map(k => (k, 0, -1L)).toDF("k", "b", "v"), Seq("k"))
    // append batch 3 above the mutation
    append(lake, 3L, (300 until 400).map(k => (k, 3, 10L * k)))
    // DELETE at id 3: kill k in [50, 60)
    DeletionVectors.deleteMor(spark, lake, "k >= 50 AND k < 60")
    // 1) bare-name travel BELOW the mutations still resolves — the
    //    records are live and MoR retires no bytes
    assert(LayoutSink.readCommittedAt(spark, lake, asOf = 1L)
      .count() == 200L)
    assert(CommitLog.committedNamesAt(f, lake, 0L).size == 1)
    // 2) BETWEEN the mutations: the version as published at id 2 is
    //    post-merge, pre-append, pre-delete
    val at2 = DeletionVectors.readMorAsOf(spark, lake, asOf = 2L)
    assert(at2.count() == 300L)
    assert(at2.filter(col("k") < 10).agg(sum(col("v"))).head.getLong(0)
      == -10L)
    assert(at2.filter(col("k") >= 50 && col("k") < 60).count() == 10L)
    // 3) the head version: both mutations + the append
    val at3 = DeletionVectors.readMorAsOf(spark, lake, asOf = 3L)
    assert(at3.count() == 390L)
    assert(at3.filter(col("k") >= 50 && col("k") < 60).count() == 0L)
    // 4) the PRE-mutation view at a SHARED id addresses via the
    //    manifest's version record; the post-mutation one via the
    //    mutation record
    val h = CommitLog.history(f, lake)
    val man3 = h.find(r => r.kind == "manifest" && r.id == 3L).get
    val (d3, v3) = CommitLog.viewOfVersion(f, lake, man3)
    val pre = DeletionVectors.readMorAt(spark, lake,
      DeletionVectors.MorCursor(d3, v3))
    assert(pre.count() == 400L) // merge applied, delete not yet
    assert(pre.filter(col("k") >= 50 && col("k") < 60).count() == 10L)
    val mut3 = h.find(r => r.kind == "mutation" && r.id == 3L).get
    val (dm, vm) = CommitLog.viewOfVersion(f, lake, mut3)
    assert(DeletionVectors.readMorAt(spark, lake,
      DeletionVectors.MorCursor(dm, vm)).count() == 390L)
    // 5) per-commit deltas: the merge introduced ONE delta file and
    //    retired none; the delete touched no data file at all
    val mut2 = h.find(r => r.kind == "mutation" && r.id == 2L).get
    assert(mut2.addedFiles == 1 && mut2.removedFiles == 0)
    assert(mut3.addedFiles == 0 && mut3.removedFiles == 0)
    assert(h.filter(_.kind == "manifest").forall(_.reachable))
  }

  test("restore reaches a PRE-mutation version with bytes retained; " +
    "the rolled-past sidecars uncover and vacuum sweeps them") {
    val lake = mkLake()
    val f = fs(lake)
    DeletionVectors.mergeMor(spark, lake,
      (0 until 10).map(k => (k, 0, -1L)).toDF("k", "b", "v"), Seq("k"))
    append(lake, 3L, (300 until 400).map(k => (k, 3, 10L * k)))
    // roll back BELOW the mutation — r9 failed fast here
    val at = CommitLog.restore(f, lake, toBatchId = 1L)
    assert(at == 3L) // publishes at the current max id
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.count() == 200L)
    // the merge's update rows are gone — original v everywhere
    assert(got.filter(col("v") < 0).count() == 0L)
    // restore's own record carries the churn it undid
    val rec = CommitLog.history(f, lake).filter(_.kind == "mutation")
      .maxBy(r => (r.id, r.gen))
    assert(rec.removedFiles == 3 && rec.addedFiles == 0)
    // rolled-past files + now-uncovered sidecar age into vacuum
    val swept = CommitLog.vacuum(f, lake, olderThanMs = 0L)
    assert(swept.exists(_.startsWith("_dv/")),
      s"uncovered sidecar not swept: $swept")
    assert(DeletionVectors.readMor(spark, lake).count() == 200L)
    // travel below still fine after the sweep (those bytes are live)
    assert(LayoutSink.readCommittedAt(spark, lake, asOf = 0L)
      .count() == 100L)
  }

  test("vacuum-reclaimed versions still fail loudly: travel below a " +
    "CoW mutation names the reclaimed files") {
    val lake = mkLake()
    val f = fs(lake)
    MergeInto.delete(spark, lake, "k % 10 = 3") // rewrites every file
    val e = intercept[IllegalArgumentException] {
      CommitLog.committedNamesAt(f, lake, 1L)
    }
    assert(e.getMessage.contains("reclaimed"), e.getMessage)
  }

  test("a fold ENDS the reach exactly as before — and a fold at a " +
    "mutation id spells .fold.mutation. so it is never mistaken for " +
    "a transparent DML record") {
    val lake = mkLake()
    val f = fs(lake)
    DeletionVectors.deleteMor(spark, lake, "k < 10")
    CommitLog.checkpoint(f, lake) // folds at id 2, mutation preserved
    val names = f.listStatus(new Path(CommitLog.logDir(lake)))
      .map(_.getPath.getName).filter(_.endsWith(".checkpoint"))
    assert(names.length == 1 && names.head.contains(".fold.mutation."),
      names.mkString(", "))
    // below the fold: truncated, loud
    val e = intercept[IllegalArgumentException] {
      CommitLog.committedNamesAt(f, lake, 1L)
    }
    assert(e.getMessage.contains("history truncated"), e.getMessage)
    // the fold id itself: as-published view serves (bare names cannot
    // — the id was rewritten AND carries vectors)
    assert(DeletionVectors.readMorAsOf(spark, lake, asOf = 2L)
      .count() == 290L)
    // replay idempotence untouched by the new spelling
    assert(CommitLog.isCommitted(f, lake, 1L))
  }

  test("history's manifest reach agrees with viewOfVersion at the " +
    "fold boundary: a truncating checkpoint AT a live manifest's id " +
    "marks it unreachable (the compactSmall shape)") {
    val lake = mkLake() // manifests 0..2
    val f = fs(lake)
    // a compaction-style direct checkpoint at the max id: truncating,
    // but it never sweeps the max id's own manifest — the exact
    // id == truncMax boundary where the two predicates used to split
    CommitLog.commitCheckpoint(f, lake, 2L,
      CommitLog.committedNames(f, lake).toSeq.sorted)
    val h = CommitLog.history(f, lake)
    val man2 = h.find(r => r.kind == "manifest" && r.id == 2L).get
    assert(!man2.reachable,
      "a manifest viewOfVersion refuses must not be reported reachable")
    // the agreement property, every manifest: reachable == servable
    h.filter(_.kind == "manifest").foreach { r =>
      val servable =
        try { CommitLog.viewOfVersion(f, lake, r); true }
        catch { case _: IllegalArgumentException => false }
      assert(r.reachable == servable,
        s"manifest id ${r.id}: history says reachable=${r.reachable} " +
          s"but viewOfVersion ${if (servable) "serves" else "refuses"}")
    }
    // the checkpoint row itself still serves the as-published view
    val ck = h.find(r => r.kind == "checkpoint" && r.id == 2L).get
    assert(ck.reachable && CommitLog.viewOfVersion(f, lake, ck)._1
      == CommitLog.committedNames(f, lake))
  }

  test("same-id generations address exactly: two merges without an " +
    "append in between stay individually reconstructable") {
    val lake = mkLake()
    val f = fs(lake)
    DeletionVectors.mergeMor(spark, lake,
      Seq((5, 0, -1L)).toDF("k", "b", "v"), Seq("k"))
    DeletionVectors.mergeMor(spark, lake,
      Seq((6, 0, -2L)).toDF("k", "b", "v"), Seq("k"))
    val muts = CommitLog.history(f, lake).filter(_.kind == "mutation")
      .sortBy(_.gen)
    assert(muts.size == 2 && muts.forall(_.id == 2L))
    def vAt(r: CommitLog.VersionRecord, k: Int): Long = {
      val (d, v) = CommitLog.viewOfVersion(f, lake, r)
      DeletionVectors.readMorAt(spark, lake,
        DeletionVectors.MorCursor(d, v))
        .filter(col("k") === k).select("v").as[Long].head()
    }
    assert(vAt(muts.head, 5) == -1L && vAt(muts.head, 6) == 60L)
    assert(vAt(muts.last, 5) == -1L && vAt(muts.last, 6) == -2L)
  }

  test("CLONE AS OF across a mutation, and of a DV-carrying version: " +
    "one metadata write, coverage travels") {
    val lake = mkLake()
    val dir = new Path(lake).getParent.toString
    val f = fs(lake)
    DeletionVectors.deleteMor(spark, lake, "k < 10")
    append(lake, 3L, (300 until 400).map(k => (k, 3, 10L * k)))
    // (a) clone the PRE-mutation version — reaches across the DML
    val (n1, v1) = Clone.shallow(spark, lake, s"$dir/pre", asOf = Some(1L))
    assert(n1 == 2 && v1 == 0)
    assert(LayoutSink.readCommitted(spark, s"$dir/pre").count() == 200L)
    // (b) clone the DV-carrying version at the mutation id — the
    // branch bootstraps WITH coverage, zero data files copied
    val (n2, v2) = Clone.shallow(spark, lake, s"$dir/dvd", asOf = Some(2L))
    assert(n2 == 3 && v2 == 1)
    assert(CommitLog.dataFileNames(f, s"$dir/dvd").isEmpty)
    val branch = DeletionVectors.readMor(spark, s"$dir/dvd")
    assert(branch.count() == 290L) // delete applied, append invisible
    assert(branch.filter(col("k") < 10).count() == 0L)
  }

  test("property: random append/merge/delete sequences — EVERY live " +
    "version's view equals an in-memory model replay") {
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 3) {
      val lake = Files.createTempDirectory(s"graft_vlp$round" + "_")
        .toString + "/lake"
      val f = fs(lake)
      // model: k -> v map AFTER each publish, in publish order
      var state = Map.empty[Int, Long]
      val snapshots = scala.collection.mutable.ArrayBuffer[Map[Int, Long]]()
      var nextK = 0
      var nextId = 0L
      def appendRows(n: Int): Unit = {
        val rows = (0 until n).map { _ =>
          val k = nextK; nextK += 1; (k, rnd.nextLong(1000))
        }
        val before = CommitLog.dataFileNames(f, lake)
        rows.toDF("k", "v").coalesce(1).write.mode("append").parquet(lake)
        CommitLog.commit(f, lake, nextId,
          (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
        nextId += 1
        state = state ++ rows
        snapshots += state
      }
      appendRows(20)
      for (_ <- 1 to 7) rnd.nextInt(3) match {
        case 0 => appendRows(5 + rnd.nextInt(10))
        case 1 => // upsert a random subset of live keys + one new key
          val live = state.keys.toSeq.sorted
          val up = rnd.shuffle(live).take(1 + rnd.nextInt(5))
            .map(k => (k, -rnd.nextLong(1000))) :+
            { val k = nextK; nextK += 1; (k, 7777L) }
          DeletionVectors.mergeMor(spark, lake, up.toDF("k", "v"),
            Seq("k"))
          state = state ++ up
          snapshots += state
        case 2 => // delete a residue class among live keys
          val m = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(m)
          val n = DeletionVectors.deleteMor(spark, lake,
            s"k % $m = $r")
          val expectGone = state.keys.filter(_ % m == r)
          assert(n == expectGone.size, s"delete marked $n")
          if (n > 0) { // a zero-match delete publishes NOTHING
            state = state -- expectGone
            snapshots += state
          }
      }
      // replay EVERY live version through viewOfVersion + readMorAt
      // and compare to the model snapshot of the same publish rank
      val recs = CommitLog.history(f, lake)
      assert(recs.size == snapshots.size,
        s"history ${recs.size} records vs ${snapshots.size} publishes")
      recs.zip(snapshots).foreach { case (rec, want) =>
        val (d, v) = CommitLog.viewOfVersion(f, lake, rec)
        val got = DeletionVectors.readMorAt(spark, lake,
          DeletionVectors.MorCursor(d, v))
          .select("k", "v").as[(Int, Long)].collect().toMap
        assert(got == want,
          s"round $round: version (${rec.id},${rec.gen},${rec.kind}) " +
            s"drifted: ${got.size} vs ${want.size} rows")
      }
    }
  }
}
