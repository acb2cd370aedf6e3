package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{ColumnMapping, CommitLog, Occ}

/** REORG … APPLY (PURGE) cost contract, measured: *purge cost is ∝
  * the CARRYING files' bytes, never ∝ lake size.* A constant-size
  * lake (sf0.1 lineitem, 64 committed files) is built with a varying
  * carrying fraction — `carrying` files hold the tombstoned `l_tax`
  * column (they predate the DROP), the rest were appended clean after
  * it — and the purge wall time across carrying ∈ {64, 16, 4, 1}
  * should fall roughly linearly with the carrying byte share while
  * the flat remainder (the 64-footer probe + one checkpoint publish)
  * stays constant: the Delta REORG cost shape. Each cell asserts the
  * rewrite accounting ((rewritten, carried) == (carrying, clean)) and
  * that no live row moved.
  *
  * Run: `sbt "runMain graft.bench.PurgeScale [reps]"`.
  * Results land in SCALE.md §"REORG PURGE". */
object PurgeScale {

  import BenchUtil.{rmrf, secs => t}

  private val TotalFiles = 64

  /** Lake with `carrying` of `total` files carrying `l_tax`: rows
    * split by `l_orderkey % total`, the carrying band committed
    * BEFORE the drop, the clean band appended after it (born without
    * the column); `copies` unions the sf0.1 table into a bigger lake
    * with the same SHARE. Returns (lake, expectedRows). */
  private def buildLake(spark: SparkSession, src: String, tag: String,
      carrying: Int, total: Int, copies: Int = 1): (String, Long) = {
    val root = s"/root/repo/target/scale/purge_$tag"
    rmrf(root)
    val lake = s"$root/lake"
    val one = spark.read.parquet(s"$src/lineitem.parquet")
    val li = (1 until copies).foldLeft(one) { (df, i) =>
      df.unionByName(one.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * 100000000L)))
    }
    val band = pmod(col("l_orderkey"), lit(total))
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    li.filter(band < carrying).repartition(carrying)
      .write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    ColumnMapping.drop(spark, lake, "l_tax")
    if (carrying < total)
      require(Occ.append(spark, lake,
        li.filter(band >= carrying).drop("l_tax"),
        numFiles = total - carrying) > 0L)
    (lake, li.count())
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

    for (carrying <- Seq(TotalFiles, 16, 4, 1); rep <- 1 to reps) {
      val (lake, expect) = buildLake(spark, sf01, s"c$carrying",
        carrying, TotalFiles)
      var out: (Int, Int) = (0, 0)
      val wall = t { out = ColumnMapping.purge(spark, lake) }
      require(out == ((carrying, TotalFiles - carrying)),
        s"accounting: $out vs ($carrying, ${TotalFiles - carrying})")
      val rows = graft.streaming.LayoutSink
        .readCommitted(spark, lake, mergeSchema = true).count()
      require(rows == expect, s"rows: $rows vs $expect")
      println(f"PURGE carrying=$carrying%2d/$TotalFiles rep=$rep " +
        f"wall=$wall%.2fs rewritten=${out._1} carried=${out._2}")
    }
    // the 10x arm: same 25% carrying SHARE, lake 10x bigger — purge
    // wall should track the carrying BYTES (~10x), the probe the file
    // count; exponents land beside the share sweep in SCALE.md
    for ((tag, copies, total) <- Seq(("1x", 1, 64), ("10x", 10, 640));
        rep <- 1 to reps) {
      val carrying = total / 4
      val (lake, expect) = buildLake(spark, sf01, tag, carrying,
        total, copies)
      var out: (Int, Int) = (0, 0)
      val wall = t { out = ColumnMapping.purge(spark, lake) }
      require(out == ((carrying, total - carrying)),
        s"$tag accounting: $out")
      val rows = graft.streaming.LayoutSink
        .readCommitted(spark, lake, mergeSchema = true).count()
      require(rows == expect, s"$tag rows: $rows vs $expect")
      println(f"PURGE10X $tag%3s rep=$rep carrying=$carrying/$total " +
        f"wall=$wall%.2fs")
    }

    // BLOCKED-WRITER WINDOW (r14 staged purge): a clean Occ.append
    // stream races the purge of a 25%-carrying lake. Under the r13
    // long-lock purge every append would block (or time out) behind
    // the whole probe+rewrite; under the staged shape appends COMMUTE
    // (narrowed conflict rule) and only contend with the metadata-
    // scale commit section — so max(append wall during purge) should
    // sit near the idle-append baseline, not near the purge wall.
    {
      val carrying = 16
      val (lake, expect) = buildLake(spark, sf01, "race", carrying,
        TotalFiles)
      val one = spark.read.parquet(s"$sf01/lineitem.parquet")
        .limit(1000).drop("l_tax").cache()
      require(one.count() == 1000L)
      val idle = (1 to 3).map(_ => t {
        require(Occ.append(spark, lake, one, numFiles = 1) > 0L)
      })
      val walls = scala.collection.mutable.ArrayBuffer[Double]()
      @volatile var purgeDone = false
      var out: (Int, Int) = (0, 0)
      var purgeWall = 0.0
      val th = new Thread(() => {
        try purgeWall = t { out = ColumnMapping.purge(spark, lake) }
        finally purgeDone = true // a throwing purge must not hang the
        // append loop — the accounting require below reports it
      })
      th.start()
      // at least one racing append even if the purge wins the sprint
      while ({
        walls += t {
          require(Occ.append(spark, lake, one, numFiles = 1) > 0L)
        }
        !purgeDone
      }) ()
      th.join()
      require(out._1 == carrying,
        s"race: the purge must land despite the append stream: $out")
      val rows = graft.streaming.LayoutSink
        .readCommitted(spark, lake, mergeSchema = true).count()
      val appended = 1000L * (3 + walls.size)
      require(rows == expect + appended,
        s"race rows: $rows vs ${expect + appended}")
      val idleMean = idle.sum / idle.size
      println(f"PURGERACE purge=$purgeWall%.2fs appends=${walls.size} " +
        f"idle_append=$idleMean%.3fs racing_append_max=${walls.max}%.3fs " +
        f"racing_append_mean=${walls.sum / walls.size}%.3fs")
      one.unpersist(); ()
    }
    spark.stop()
  }
}
