package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{ChangeDataFeed, CommitLog, MergeInto}

/** CHANGE DATA FEED cost contract, measured: *capture is ∝ changed
  * rows, never ∝ lake; reading a window is ∝ the window's churn,
  * never ∝ lake.* The same 1000-key CoW merge runs against a 1× and
  * a 10× lake, feed OFF vs ON: the ON−OFF delta is the capture cost
  * (the extra pre/post-image pass over the TOUCHED files plus the
  * `_cdf` write), which must stay flat as the lake grows 10× —
  * Delta's CDC-write cost shape. The window read then serves the
  * mutation's images from `_cdf` alone; its wall time must also stay
  * flat (it never opens a lake data file for a mutation window).
  *
  * Run: `sbt "runMain graft.bench.CdfScale [reps]"`.
  * Results land in SCALE.md §"Change data feed". */
object CdfScale {

  import BenchUtil.{rmrf, secs => t}

  private def buildLake(spark: SparkSession, src: String, tag: String,
      files: Int): String = {
    val root = s"/root/repo/target/scale/cdf_$tag"
    rmrf(root)
    val lake = s"$root/lake"
    spark.read.parquet(s"$src/lineitem.parquet")
      .repartitionByRange(files, col("l_orderkey")).write.parquet(lake)
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    lake
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val tenx = CatalogScale.ensure10x(spark, sf01)

    // the CONSTANT churn: 1000 low orderkeys, present at both scales
    import spark.implicits._
    val keys = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select(col("l_orderkey")).distinct()
      .orderBy(col("l_orderkey")).limit(1000).as[Long].collect().toSeq
    val updates = spark.read.parquet(s"$sf01/lineitem.parquet")
      .filter(col("l_orderkey").isin(keys: _*))
      .dropDuplicates("l_orderkey")
      .withColumn("l_quantity", col("l_quantity") + 100)
      .localCheckpoint()

    // JIT-warm both paths untimed
    val warm = buildLake(spark, "/root/testdata/sf0.001", "warm", 2)
    MergeInto.merge(spark, warm, updates, Seq("l_orderkey")): Unit
    val warm2 = buildLake(spark, "/root/testdata/sf0.001", "warm2", 2)
    ChangeDataFeed.enable(spark, warm2)
    val warmFrom = ChangeDataFeed.currentVersion(spark, warm2)
    MergeInto.merge(spark, warm2, updates, Seq("l_orderkey")): Unit
    ChangeDataFeed.read(spark, warm2, warmFrom,
      ChangeDataFeed.currentVersion(spark, warm2)).count(): Unit

    println("""{"probe":"cdf","cells":[""")
    Seq(("1x", sf01, 16), ("10x", tenx, 160)).zipWithIndex
      .foreach { case ((tag, src, files), i) =>
        val outcomes = (1 to reps).map { _ =>
          val off = buildLake(spark, src, s"off_$tag", files)
          val offSec = t {
            MergeInto.merge(spark, off, updates, Seq("l_orderkey")): Unit
          }
          val on = buildLake(spark, src, s"on_$tag", files)
          ChangeDataFeed.enable(spark, on)
          val from = ChangeDataFeed.currentVersion(spark, on)
          val onSec = t {
            MergeInto.merge(spark, on, updates, Seq("l_orderkey")): Unit
          }
          var rows = 0L
          val readSec = t {
            rows = ChangeDataFeed.read(spark, on, from,
              ChangeDataFeed.currentVersion(spark, on)).count()
          }
          (offSec, onSec, readSec, rows)
        }
        val best = outcomes.minBy(o => o._2)
        val l = f"""{"cell":"$tag","files":$files,""" +
          f""""merge_off_sec":${best._1}%.2f,""" +
          f""""merge_on_sec":${best._2}%.2f,""" +
          f""""capture_overhead_sec":${best._2 - best._1}%.2f,""" +
          f""""window_read_sec":${best._3}%.2f,""" +
          f""""window_rows":${best._4}}"""
        println("  " + (if (i > 0) "," else "") + l)
      }
    println("]}")
    retentionCells(spark, sf01)
    spark.stop()
  }

  /** FEED RETENTION HORIZON (r12 VERDICT ask #8): `_cdf` directories
    * age into vacuum's sweep once [[CommitLog.retention]] expires
    * their versions' records — this arm MEASURES that operational
    * contract at two churn sizes. Six MoR updates of B keys each;
    * age-based retention (injected clock) expires the first ~half;
    * vacuum then reclaims exactly the expired mutations' `_cdf`
    * bytes — reclaimed ∝ expired churn, and the live feed window
    * stays servable — while a cursor from BELOW the fold fails fast
    * with the resync message (a lagging consumer can never silently
    * skip the expired changes). */
  private def retentionCells(spark: SparkSession, sf01: String): Unit = {
    import graft.sources.DeletionVectors
    import spark.implicits._
    val nBatches = 6
    println("""{"probe":"cdf_retention","cells":[""")
    Seq(500, 5000).zipWithIndex.foreach { case (b, i) =>
      val lake = buildLake(spark, sf01, s"ret_$b", 16)
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      ChangeDataFeed.enable(spark, lake)
      val from = ChangeDataFeed.currentVersion(spark, lake)
      val keys = spark.read.parquet(s"$sf01/lineitem.parquet")
        .select(col("l_orderkey")).distinct().orderBy(col("l_orderkey"))
        .limit(b * nBatches + 1).as[Long].collect()
      val oneRow = spark.read.parquet(s"$sf01/lineitem.parquet")
        .limit(1).localCheckpoint()
      var tMid = 0L
      var liveFrom = from
      (0 until nBatches).foreach { j =>
        if (j == nBatches / 2) { Thread.sleep(1500L)
          tMid = System.currentTimeMillis() }
        if (j == nBatches - 1)
          liveFrom = ChangeDataFeed.currentVersion(spark, lake)
        // a 1-row blind append first: retention expires whole IDS (a
        // fold cannot split same-id generations), so each batch must
        // claim its own commit id before its MoR update publishes at it
        graft.sources.Occ.append(spark, lake, oneRow): Unit
        val (lo, hi) = (keys(j * b), keys((j + 1) * b))
        DeletionVectors.updateMor(spark, lake,
          s"l_orderkey >= $lo AND l_orderkey < $hi",
          Map("l_quantity" -> "l_quantity + 1")): Unit
      }
      def cdfBytes: Long = {
        val p = new Path(s"$lake/_cdf")
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }
      val before = cdfBytes
      val now = System.currentTimeMillis()
      val (expired, _) = CommitLog.retention(fs, lake,
        olderThanMs = now - tMid, graceMs = 0L, nowMs = now)
      val sweptCdf = CommitLog.vacuum(fs, lake, olderThanMs = 0L)
        .count(_.startsWith("_cdf/"))
      val after = cdfBytes
      // the live window still serves; a pre-fold cursor fails fast
      val head = ChangeDataFeed.currentVersion(spark, lake)
      val liveRows = ChangeDataFeed.read(spark, lake, liveFrom, head)
        .count()
      val failFast =
        try { ChangeDataFeed.read(spark, lake, from, head).count(); false }
        catch {
          case e: ChangeDataFeed.FeedUnservableException =>
            e.getMessage.contains("resync")
        }
      require(failFast,
        "a pre-fold cursor must fail fast with the resync message")
      val l = f"""{"cell":$b,"batches":$nBatches,""" +
        f""""records_expired":$expired,"cdf_dirs_swept":$sweptCdf,""" +
        f""""cdf_bytes_before":$before,"cdf_bytes_after":$after,""" +
        f""""cdf_bytes_reclaimed":${before - after},""" +
        f""""live_window_rows":$liveRows,"prefold_cursor_fails":true}"""
      println("  " + (if (i > 0) "," else "") + l)
    }
    println("]}")
  }
}
