package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{ChangeDataFeed, CommitLog, DeletionVectors,
  MergeInto, Occ}
import graft.sources.MergeInto.{MatchedDelete, MatchedUpdate,
  NotMatchedInsert}

/** Property net over the change data feed: for RANDOM mutation
  * sequences mixing every verb class (CoW update/delete/merge, MoR
  * delete/merge, clause merges both ways — locked AND OCC since
  * r13 — appends, compactions), a
  * consumer that replays the feed version-by-version — removals
  * (delete/update_preimage) before additions (insert/
  * update_postimage) within each version — reconstructs the lake's
  * EXACT live content. Any missed row, double-served image, wrong
  * version attribution or resurrection shows up as a replica
  * mismatch. Seeds are fixed: failures reproduce. */
class FeedPropertySpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed lake of (k, v), keys 0..149 over two batches. */
  private def mkLake(tag: String): String = {
    val lake =
      Files.createTempDirectory(s"graft_fprop_$tag").toString + "/lake"
    val f = fs(lake)
    for (b <- 0 to 1) {
      val before = CommitLog.dataFileNames(f, lake)
      (0 until 75).map(b * 1000 + _).map(k => (k, k.toLong * 3))
        .toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(lake)
      CommitLog.commit(f, lake, b,
        (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
    }
    lake
  }

  /** Apply one random mutation; returns a short label. `fresh` hands
    * out never-used keys for inserts/appends. Two sequencing rules
    * the generator obeys (both are the LAKE's documented contracts,
    * not feed weaknesses): CoW verbs refuse a lake with live deletion
    * vectors, so they compact first (compaction is feed-transparent);
    * and CoW predicates stay on BASE keys (< 50000) — rewriting a
    * post-enable APPEND's file before its insert segment is consumed
    * is the feed's documented loud-resync case, which the dedicated
    * fail-fast arms cover. Matched-clause sources draw EXISTING base
    * keys so the matched arms genuinely fire. */
  private def randomOp(rnd: Random, lake: String,
      fresh: Iterator[Int]): String = {
    val m = rnd.nextInt(30)
    def baseKey(): Int =
      if (rnd.nextBoolean()) rnd.nextInt(75) else 1000 + rnd.nextInt(75)
    rnd.nextInt(10) match {
      case 0 =>
        DeletionVectors.compact(spark, lake): Unit
        MergeInto.update(spark, lake, s"k % 30 = $m AND k < 50000",
          Map("v" -> s"v + ${rnd.nextInt(1000)}")): Unit
        "cow-update"
      case 1 =>
        DeletionVectors.compact(spark, lake): Unit
        MergeInto.delete(spark, lake,
          s"k % 30 = $m AND k < 50000"): Unit
        "cow-delete"
      case 2 =>
        DeletionVectors.compact(spark, lake): Unit
        val rows = Seq.fill(3)((fresh.next(), rnd.nextLong(1000)))
        MergeInto.merge(spark, lake, rows.toDF("k", "v"), Seq("k")): Unit
        "cow-merge-insert"
      case 3 =>
        DeletionVectors.deleteMor(spark, lake,
          s"k % 30 = $m AND k < 50000"): Unit
        "mor-delete"
      case 4 =>
        val rows = Seq.fill(3)((fresh.next(), rnd.nextLong(1000)))
        DeletionVectors.mergeMor(spark, lake, rows.toDF("k", "v"),
          Seq("k")): Unit
        "mor-merge-insert"
      case 5 =>
        DeletionVectors.compact(spark, lake): Unit
        MergeInto.mergeClauses(spark, lake,
          Seq((baseKey(), rnd.nextLong(1000)),
            (fresh.next(), rnd.nextLong(1000))).toDF("k", "nv"),
          Seq("k"),
          matched = Seq(MatchedUpdate(Map("v" -> "s.nv"))),
          notMatched = Seq(NotMatchedInsert(
            Map("k" -> "s.k", "v" -> "s.nv")))): Unit
        "cow-clauses"
      case 6 =>
        DeletionVectors.mergeClausesMor(spark, lake,
          Seq((baseKey(), rnd.nextLong(1000)),
            (fresh.next(), rnd.nextLong(1000))).toDF("k", "nv"),
          Seq("k"),
          matched = Seq(
            MatchedDelete(Some(s"t.v % 7 = ${rnd.nextInt(7)}")),
            MatchedUpdate(Map("v" -> "s.nv"))),
          notMatched = Seq(NotMatchedInsert(
            Map("k" -> "s.k", "v" -> "s.nv")))): Unit
        "mor-clauses"
      case 7 =>
        val f = fs(lake)
        val before = CommitLog.dataFileNames(f, lake)
        val id = CommitLog.maxCommittedId(f, lake) + 1
        Seq.fill(4)((fresh.next(), rnd.nextLong(1000))).toDF("k", "v")
          .coalesce(1).write.mode("append").parquet(lake)
        CommitLog.commit(f, lake, id,
          (CommitLog.dataFileNames(f, lake) -- before).toSeq.sorted)
        "append"
      // the r13 OCC clause verbs: same capture contract as their
      // locked twins (they run the SAME prepare code), exercised here
      // through the staged-then-published `_cdf` path
      case 8 =>
        DeletionVectors.compact(spark, lake): Unit
        Occ.mergeClauses(spark, lake,
          Seq((baseKey(), rnd.nextLong(1000)),
            (fresh.next(), rnd.nextLong(1000))).toDF("k", "nv"),
          Seq("k"),
          matched = Seq(MatchedUpdate(Map("v" -> "s.nv"))),
          notMatched = Seq(NotMatchedInsert(
            Map("k" -> "s.k", "v" -> "s.nv")))): Unit
        "occ-cow-clauses"
      case 9 =>
        Occ.mergeClausesMor(spark, lake,
          Seq((baseKey(), rnd.nextLong(1000)),
            (fresh.next(), rnd.nextLong(1000))).toDF("k", "nv"),
          Seq("k"),
          matched = Seq(
            MatchedDelete(Some(s"t.v % 5 = ${rnd.nextInt(5)}")),
            MatchedUpdate(Map("v" -> "s.nv"))),
          notMatched = Seq(NotMatchedInsert(
            Map("k" -> "s.k", "v" -> "s.nv")))): Unit
        "occ-mor-clauses"
    }
  }

  /** Replay the feed window into a key→value replica: per version in
    * order, removals before additions. */
  private def replay(lake: String, from: ChangeDataFeed.Version,
      replica: mutable.Map[Int, Long]): Unit = {
    val rows = ChangeDataFeed.read(spark, lake, from,
      ChangeDataFeed.currentVersion(spark, lake))
      .select(col("_commit_id"), col("_commit_gen"),
        col("_change_type"), col("k"), col("v"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2),
        r.getInt(3), r.getLong(4)))
    rows.map(_._1).distinct.sorted.foreach { ver =>
      val inVer = rows.filter(_._1 == ver)
      inVer.filter(t => t._2 == "delete" || t._2 == "update_preimage")
        .foreach(t => replica.remove(t._3))
      inVer.filter(t => t._2 == "insert" || t._2 == "update_postimage")
        .foreach(t => replica.put(t._3, t._4))
    }
  }

  private def liveContent(lake: String): Map[Int, Long] =
    DeletionVectors.readMor(spark, lake)
      .select(col("k"), col("v")).as[(Int, Long)].collect().toMap

  for (seed <- Seq(7, 41, 1013))
    test(s"random verb sequence, seed $seed: replaying the feed " +
      "reconstructs the lake exactly") {
      val rnd = new Random(seed)
      val lake = mkLake(s"s$seed")
      ChangeDataFeed.enable(spark, lake)
      val fresh = Iterator.from(50000 + seed * 1000)
      val replica = mutable.Map[Int, Long]() ++ liveContent(lake)
      var from = ChangeDataFeed.currentVersion(spark, lake)
      val ops = mutable.Buffer[String]()
      for (step <- 1 to 8) {
        ops += randomOp(rnd, lake, fresh)
        if (step % 3 == 0) {
          // periodic physical fold: must be feed-transparent
          DeletionVectors.compact(spark, lake): Unit
          ops += "compact"
        }
        if (step % 2 == 0) {
          // consume mid-sequence: later windows must compose
          replay(lake, from, replica)
          from = ChangeDataFeed.currentVersion(spark, lake)
        }
      }
      replay(lake, from, replica)
      val live = liveContent(lake)
      assert(replica.toMap == live,
        s"ops = ${ops.mkString(" -> ")}; " +
          s"replica-only = ${(replica.keySet -- live.keySet).toSeq.sorted.take(5)}, " +
          s"live-only = ${(live.keySet -- replica.keySet).toSeq.sorted.take(5)}")
    }
}
