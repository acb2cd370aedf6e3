package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, DeletionVectors, IncrementalView}

/** Incremental-view maintenance cost with `distinctCols`, measured:
  * *a refresh costs ∝ churn + the view's own aux state, never ∝
  * lake.* The SAME fixed churn (a 1000-row MoR delete + a 3000-row
  * merge-insert) runs against a 1× and a 10× lake; the incremental
  * refresh (counts, sums, and the `nd_src` refcount auxiliary) must
  * stay FLAT across the growth while the full rebuild grows with the
  * lake. Equality with the recompute asserted per cell.
  *
  * Run: `sbt "runMain graft.bench.IncrViewScale [reps]"`.
  * Results land in SCALE.md §"Incremental view with distinctCols". */
object IncrViewScale {

  import BenchUtil.{rmrf, secs => t}

  private def buildLake(spark: SparkSession, src: String, tag: String,
      copies: Int): String = {
    val root = s"/root/repo/target/scale/ivd_$tag"
    rmrf(root)
    val lake = s"$root/lake"
    val one = spark.read.parquet(s"$src/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity").as("v"),
        pmod(col("l_orderkey"), lit(8L)).cast("string").as("g"),
        concat(lit("s"), pmod(col("l_suppkey"), lit(200L))).as("src"))
    val big = (1 until copies).foldLeft(one) { (df, i) =>
      df.unionByName(one.withColumn("k",
        col("k") + lit(i * 100000000L)))
    }
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // range-cluster by key so the fixed base-key churn stays
    // file-localized at 10× — a key-spread layout would make the
    // delete's old-value position join touch every file (the cost is
    // ∝ files the pairs NAME, so the fixture must not name them all)
    big.repartitionByRange(8 * copies, col("k")).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    lake
  }

  private def recompute(spark: SparkSession, lake: String) =
    DeletionVectors.readMor(spark, lake).groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("src")).as("nd_src"))
      .orderBy(col("g")).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.1"

    for ((tag, copies) <- Seq(("1x", 1), ("10x", 10)); rep <- 1 to reps) {
      val lake = buildLake(spark, sf01, tag, copies)
      val view = lake.replace("/lake", s"/view_$rep")
      val tFull = t {
        IncrementalView.refresh(spark, lake, view, Seq("g"), Seq("v"),
          distinctCols = Seq("src")): Unit
      }
      // the CONSTANT churn, present at both scales (base keys only)
      DeletionVectors.deleteMor(spark, lake,
        s"k < 100000000 AND k % 600 = $rep"): Unit
      DeletionVectors.mergeMor(spark, lake,
        (0 until 3000).map(i =>
          (900000000L + rep * 10000L + i, 1.0d,
            (i % 8).toString, s"mint$rep")).toDF("k", "v", "g", "src"),
        Seq("k")): Unit
      var st: IncrementalView.RefreshStats = null
      val tIncr = t {
        st = IncrementalView.refresh(spark, lake, view, Seq("g"),
          Seq("v"), distinctCols = Seq("src"))
      }
      require(st.mode == "incremental", s"$tag rep $rep: ${st.mode}")
      val got = IncrementalView.readView(spark, view)
        .select(col("g"), col("n"), col("nd_src")).orderBy(col("g"))
        .collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      require(got == recompute(spark, lake),
        s"$tag rep $rep: view drifted from the recompute")
      println(f"IVD $tag%3s rep=$rep full=$tFull%.2fs " +
        f"incr=$tIncr%.2fs (churn fixed: ~1k deletes + 3k inserts)")
    }
    spark.stop()
  }
}
