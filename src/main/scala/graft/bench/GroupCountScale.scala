package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{PartitionedLake, StatsIndex}

/** Metadata-first GROUPED COUNT vs the plain grouped scan, measured:
  * on a lake clustered by the group column, `countByGroup` answers
  * from footer stats for every single-group file and scans only the
  * boundary shell, so its wall time should stay FLAT as the lake
  * grows while the plain `groupBy().count()` grows linearly. Lakes at
  * 1× and 10× (sf0.1 lineitem, range-clustered on `l_orderkey` with
  * the group derived from it so most files are single-group), equality
  * asserted per cell.
  *
  * Run: `sbt "runMain graft.bench.GroupCountScale [reps]"`.
  * Results land in SCALE.md §"Metadata-first grouped count". */
object GroupCountScale {

  import BenchUtil.{rmrf, secs => t}

  private def buildLake(spark: SparkSession, src: String, tag: String,
      copies: Int, files: Int): String = {
    val root = s"/root/repo/target/scale/gcount_$tag"
    rmrf(root)
    val lake = s"$root/lake"
    val one = spark.read.parquet(s"$src/lineitem.parquet")
    val big = (1 until copies).foldLeft(one) { (df, i) =>
      df.unionByName(one.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * 100000000L)))
    }
    // 64 groups, stable across the copy shift (1e8 ≡ 0 mod 64); the
    // clustering LEADS with grp, so nearly every range file is
    // single-group — the partition-aligned dashboard layout
    val df = big.withColumn("grp", pmod(col("l_orderkey"), lit(64L)))
    PartitionedLake.writeClustered(df, lake, Seq("grp", "l_orderkey"),
      numFiles = files)
    StatsIndex.build(spark, lake, Seq("grp", "l_orderkey"),
      s"$root/idx")
    lake
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"

    for ((tag, copies, files) <- Seq(("1x", 1, 64), ("10x", 10, 640))) {
      val lake = buildLake(spark, sf01, tag, copies, files)
      val idx = lake.replace("/lake", "/idx")
      for (rep <- 1 to reps) {
        var meta: Map[Long, Long] = Map.empty
        val tMeta = t {
          meta = StatsIndex.countByGroup(spark, lake, idx, "grp")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        }
        var plain: Map[Long, Long] = Map.empty
        val tPlain = t {
          plain = spark.read.parquet(lake).groupBy(col("grp")).count()
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        }
        require(meta == plain,
          s"grouped counts diverge at $tag (${meta.size} vs ${plain.size} groups)")
        println(f"GCOUNT $tag%3s rep=$rep meta=$tMeta%.2fs " +
          f"plain=$tPlain%.2fs groups=${meta.size}")
        // min/max sibling (r14): same layout, extrema from footer
        // bounds — same flat-vs-linear contract
        var metaMm: Map[Long, (Long, Long)] = Map.empty
        val tMetaMm = t {
          metaMm = StatsIndex.minMaxByGroup(spark, lake, idx, "grp",
            "l_orderkey").collect()
            .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
            .toMap
        }
        var plainMm: Map[Long, (Long, Long)] = Map.empty
        val tPlainMm = t {
          plainMm = spark.read.parquet(lake).groupBy(col("grp"))
            .agg(min(col("l_orderkey")), max(col("l_orderkey")))
            .collect()
            .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
            .toMap
        }
        require(metaMm == plainMm,
          s"grouped min/max diverge at $tag")
        println(f"GMINMAX $tag%3s rep=$rep meta=$tMetaMm%.2fs " +
          f"plain=$tPlainMm%.2fs groups=${metaMm.size}")
      }
    }
    spark.stop()
  }
}
