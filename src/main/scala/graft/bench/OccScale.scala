package graft.bench

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, Occ}

/** COMMIT THROUGHPUT: optimistic concurrency vs the long writer lock
  * (r9 VERDICT ask #3). N independent appender threads each commit K
  * batches into ONE lake:
  *
  *  - `locked` — each append's WHOLE body (parquet write + manifest)
  *    runs inside `CommitLog.withWriterLock`, the serialization shape
  *    the classic verbs impose on independent pipelines;
  *  - `occ` — `Occ.append`: the parquet writes overlap freely; only
  *    the metadata-scale commit section (rename + id claim + one
  *    record rename) serializes.
  *
  * Reported: wall seconds per mode and the speedup. The expected
  * shape: locked ≈ sum of all write times; occ ≈ max of the per-thread
  * sums + N·K commit sections (~ms each) — approaching N× with N
  * appenders on an unloaded box. Row counts are asserted equal, so
  * both modes do identical work. Results land in SCALE.md
  * §"Commit throughput". Run: `sbt "runMain graft.bench.OccScale
  * [appenders] [batchesEach]"`. */
object OccScale {

  import BenchUtil.{rmrf, secs}

  def main(args: Array[String]): Unit = {
    val n = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(4)
    val k = args.drop(1).headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one batch = a real parquet write (wide-ish rows, one file) so
    // the measured contention is write-vs-write, not scheduler noise
    val li = spark.read
      .parquet("/root/testdata/sf0.1/lineitem.parquet")
      .limit(200000).localCheckpoint()
    val exec = Executors.newFixedThreadPool(n)
    val pool = ExecutionContext.fromExecutor(exec)
    val expected = li.count() * n * k
    try {

    def run(tag: String)(append: (String, Int) => Unit): Double = {
      val root = s"/root/repo/target/scale/occ_$tag"
      rmrf(root)
      val lake = s"$root/lake"
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // bootstrap so the lake exists with a log
      fs.mkdirs(new Path(CommitLog.logDir(lake)))
      val sec = secs {
        val fut = (0 until n).map { t =>
          Future { (0 until k).foreach(_ => append(lake, t)) }(pool)
        }
        fut.foreach(Await.result(_, 30.minutes))
      }
      val got = graft.streaming.LayoutSink.readCommitted(spark, lake)
        .count()
      require(got == expected, s"$tag: $got rows, expected $expected")
      sec
    }

    val locked = run("locked") { (lake, t) =>
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      CommitLog.withWriterLock(fs, lake, waitMs = 1800000L) {
        val before = CommitLog.dataFileNames(fs, lake)
        li.withColumn("writer", lit(t)).coalesce(1)
          .write.mode("append").parquet(lake)
        val files =
          (CommitLog.dataFileNames(fs, lake) -- before).toSeq.sorted
        val id = math.max(CommitLog.maxCommittedId(fs, lake), -1L) + 1L
        CommitLog.commit(fs, lake, id, files)
      }
    }
    val occ = run("occ") { (lake, t) =>
      Occ.append(spark, lake, li.withColumn("writer", lit(t)),
        numFiles = 1, commitWaitMs = 1800000L): Unit
    }

    // MIXED cell: (n-1) appender threads + ONE merger thread doing k
    // sequential MoR upserts against a pre-committed base — the
    // ingest-meets-DML interleave the staged-writer surface exists
    // for. `locked` uses the classic long-lock verbs; `occ` the
    // staged ones (the merge pays conflict retries when an append
    // commits inside its window — the honest Delta trade, measured).
    import graft.sources.DeletionVectors
    val base = spark.range(2000000L)
      .selectExpr("CAST(id AS LONG) AS k", "id * 2 AS v")
      .localCheckpoint()
    val upd = spark.range(50000L)
      .selectExpr("CAST(id AS LONG) AS k", "CAST(-1 AS LONG) AS v")
      .localCheckpoint()
    def runMixed(tag: String, prefix: String = "occm")(
        append: (String, Int) => Unit, merge: String => Unit): Double = {
      val root = s"/root/repo/target/scale/${prefix}_$tag"
      rmrf(root)
      val lake = s"$root/lake"
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      base.coalesce(4).write.parquet(lake)
      CommitLog.commit(fs, lake, 0L,
        CommitLog.dataFileNames(fs, lake).toSeq.sorted)
      val sec = secs {
        val appends = (0 until n - 1).map { t =>
          Future { (0 until k).foreach(_ => append(lake, t)) }(pool)
        }
        val merges = Future { (0 until k).foreach(_ => merge(lake)) }(pool)
        (appends :+ merges).foreach(Await.result(_, 30.minutes))
      }
      val got = DeletionVectors.readMor(spark, lake)
      require(got.count() ==
        2000000L + li.count() * (n - 1) * k &&
        got.filter(col("k") < 50000 && col("v") =!= -1L).count() == 0L,
        s"$tag: mixed end state drifted")
      sec
    }
    val mixedLocked = runMixed("locked")(
      append = { (lake, t) =>
        val fs = new Path(lake)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        CommitLog.withWriterLock(fs, lake, waitMs = 1800000L) {
          val before = CommitLog.dataFileNames(fs, lake)
          li.select((col("l_orderkey") + lit(t) * 100000000L + 10000000L)
              .as("k"), lit(9L).as("v"))
            .coalesce(1).write.mode("append").parquet(lake)
          val files =
            (CommitLog.dataFileNames(fs, lake) -- before).toSeq.sorted
          val id = math.max(CommitLog.maxCommittedId(fs, lake), -1L) + 1L
          CommitLog.commit(fs, lake, id, files)
        }
      },
      merge = { lake =>
        // the locked verb fails fast on a held lock — spin-retry as a
        // production caller would, so the cell measures serialization,
        // not give-up
        var done = false
        while (!done) {
          try { DeletionVectors.mergeMor(spark, lake, upd, Seq("k"))
            done = true }
          catch { case _: IllegalStateException => Thread.sleep(50L) }
        }
      })
    val mixedOcc = runMixed("occ")(
      append = { (lake, t) =>
        Occ.append(spark, lake,
          li.select((col("l_orderkey") + lit(t) * 100000000L + 10000000L)
            .as("k"), lit(9L).as("v")),
          numFiles = 1, commitWaitMs = 1800000L): Unit
      },
      merge = { lake =>
        Occ.mergeMor(spark, lake, upd, Seq("k"),
          maxRetries = 50, commitWaitMs = 1800000L): Unit
      })
    // COW MIX (r10 ask #5): same interleave, but the merger runs
    // COPY-ON-WRITE merges — the verb class that before r11 held the
    // writer lock across its whole touched-file rewrite. `locked` is
    // MergeInto.merge behind a spin-retry (the lock is fail-fast);
    // `occ` is Occ.merge, whose commit section conflicts only on
    // touched-file intersection — the racing appends commute, so the
    // rewrite overlaps the ingest instead of serializing it.
    import graft.sources.MergeInto
    val mixedCowLocked = runMixed("locked", prefix = "occc")(
      append = { (lake, t) =>
        val fs = new Path(lake)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        CommitLog.withWriterLock(fs, lake, waitMs = 1800000L) {
          val before = CommitLog.dataFileNames(fs, lake)
          li.select((col("l_orderkey") + lit(t) * 100000000L + 10000000L)
              .as("k"), lit(9L).as("v"))
            .coalesce(1).write.mode("append").parquet(lake)
          val files =
            (CommitLog.dataFileNames(fs, lake) -- before).toSeq.sorted
          val id = math.max(CommitLog.maxCommittedId(fs, lake), -1L) + 1L
          CommitLog.commit(fs, lake, id, files)
        }
      },
      merge = { lake =>
        var done = false
        while (!done) {
          try { MergeInto.merge(spark, lake, upd, Seq("k")); done = true }
          catch { case _: IllegalStateException => Thread.sleep(50L) }
        }
      })
    val mixedCowOcc = runMixed("occ", prefix = "occc")(
      append = { (lake, t) =>
        Occ.append(spark, lake,
          li.select((col("l_orderkey") + lit(t) * 100000000L + 10000000L)
            .as("k"), lit(9L).as("v")),
          numFiles = 1, commitWaitMs = 1800000L): Unit
      },
      merge = { lake =>
        Occ.merge(spark, lake, upd, Seq("k"),
          maxRetries = 50, commitWaitMs = 1800000L): Unit
      })
    println(f"""{"metric":"occ_commit_throughput","appenders":$n,""" +
      f""""batches_each":$k,"locked_sec":$locked%.2f,""" +
      f""""occ_sec":$occ%.2f,"speedup":${locked / occ}%.2f,""" +
      f""""mixed_locked_sec":$mixedLocked%.2f,""" +
      f""""mixed_occ_sec":$mixedOcc%.2f,""" +
      f""""mixed_speedup":${mixedLocked / mixedOcc}%.2f,""" +
      f""""mixed_cow_locked_sec":$mixedCowLocked%.2f,""" +
      f""""mixed_cow_occ_sec":$mixedCowOcc%.2f,""" +
      f""""mixed_cow_speedup":${mixedCowLocked / mixedCowOcc}%.2f}""")
    } finally exec.shutdown()
  }
}
