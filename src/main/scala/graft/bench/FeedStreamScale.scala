package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{ChangeDataFeed, CommitLog, DeletionVectors}
import graft.streaming.FeedStream

/** FEED-AS-A-STREAM cost contract, measured (r12 VERDICT ask #5):
  * `qs22` proved the [[FeedStream]] source CORRECT (exactly-once
  * windows across DML) but no artifact isolated what a trigger COSTS.
  * This harness drives the consume loop — commit a MoR update of B
  * keys, wait for the stream to drain it — at three churn sizes over
  * the SAME sf0.1 lake, measuring:
  *
  *  - per-batch drain latency (commit → batch counted by the
  *    consumer): p50/p95 over `nBatches` windows per cell, and the
  *    served-rows throughput;
  *  - the IDLE POLL overhead — [[ChangeDataFeed.currentVersion]], one
  *    commit-log listing — sampled before the first and after the
  *    last mutation, which must stay flat (it reads log NAMES, never
  *    data, so accumulated versions add directory entries only).
  *
  * The expected shape is the index-upkeep cell's twin:
  * FIXED-OVERHEAD-DOMINATED at small churn (poll sleep + log listing
  * + plan overhead dwarf the `_cdf` bytes), converging to ∝ churn as
  * B grows — so the sizing rule is the same: batch mutations so the
  * churn term at least matches the fixed term, and keep `pollMs` well
  * under the commit cadence. Results land in SCALE.md §"Feed stream
  * per-trigger cost". Run AFTER any bench artifact (page-cache
  * discipline): `sbt "runMain graft.bench.FeedStreamScale [nBatches]"`. */
object FeedStreamScale {

  import BenchUtil.{rmrf, secs}

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.1"
    val sizes = Seq(1000, 5000, 20000) // distinct orderkeys per batch
    // (sf0.1 lineitem holds ~150k distinct orderkeys; 20000×6 fits)

    def pollMsAvg(lake: String, n: Int = 50): Double =
      secs { (1 to n).foreach { _ =>
        ChangeDataFeed.currentVersion(spark, lake): Unit } } * 1000.0 / n

    // JIT-warm the whole loop untimed on a tiny lake
    warmCell(spark)

    println("""{"probe":"feed_stream","cells":[""")
    sizes.zipWithIndex.foreach { case (b, i) =>
      val root = s"/root/repo/target/scale/feed_stream_$b"
      rmrf(root)
      val lake = s"$root/lake"
      spark.read.parquet(s"$sf/lineitem.parquet")
        .repartitionByRange(16, col("l_orderkey")).write.parquet(lake)
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      CommitLog.commit(fs, lake, 0L,
        CommitLog.dataFileNames(fs, lake).toSeq.sorted)
      ChangeDataFeed.enable(spark, lake)
      // batch i updates the i-th slice of b distinct orderkeys — a
      // range predicate, so churn ∝ b without giant IN-lists
      val keys = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey")).distinct().orderBy(col("l_orderkey"))
        .limit(b * nBatches + 1).as[Long].collect()
      require(keys.length == b * nBatches + 1,
        s"sf0.1 lineitem has too few orderkeys for b=$b")
      val pollBefore = pollMsAvg(lake)
      val served = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = FeedStream.start(spark, lake, s"$root/ckp",
        pollMs = 5L) { (changes, _) =>
        served.addAndGet(changes.count()); ()
      }
      val drains =
        try (0 until nBatches).map { j =>
          val (lo, hi) = (keys(j * b), keys((j + 1) * b))
          val n = DeletionVectors.updateMor(spark, lake,
            s"l_orderkey >= $lo AND l_orderkey < $hi",
            Map("l_quantity" -> "l_quantity + 1"))
          require(n > 0, s"batch $j matched nothing")
          secs { q.processAllAvailable() }
        } finally q.stop()
      require(q.exception.isEmpty, q.exception.toString)
      val pollAfter = pollMsAvg(lake)
      val sorted = drains.sorted
      val p50 = sorted(sorted.size / 2) * 1000.0
      val p95 = sorted(math.min(sorted.size - 1,
        (sorted.size * 0.95).toInt)) * 1000.0
      val rowsPerSec = served.get() / math.max(drains.sum, 1e-9)
      val l = f"""{"cell":$b,"batches":$nBatches,""" +
        f""""drain_p50_ms":$p50%.0f,"drain_p95_ms":$p95%.0f,""" +
        f""""window_rows":${served.get()},""" +
        f""""rows_per_sec":$rowsPerSec%.0f,""" +
        f""""poll_ms_before":$pollBefore%.2f,""" +
        f""""poll_ms_after":$pollAfter%.2f}"""
      println("  " + (if (i > 0) "," else "") + l)
    }
    println("]}")
    spark.stop()
  }

  private def warmCell(spark: SparkSession): Unit = {
    val root = "/root/repo/target/scale/feed_stream_warm"
    rmrf(root)
    val lake = s"$root/lake"
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .coalesce(2).write.parquet(lake)
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    ChangeDataFeed.enable(spark, lake)
    val q = FeedStream.start(spark, lake, s"$root/ckp",
      pollMs = 5L) { (changes, _) => changes.count(): Unit }
    try {
      DeletionVectors.updateMor(spark, lake, "l_orderkey < 100",
        Map("l_quantity" -> "l_quantity + 1")): Unit
      q.processAllAvailable()
    } finally q.stop()
  }
}
