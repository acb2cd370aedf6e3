package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{StatsIndex, ZOrder}

/** File-level skipping index: pruning must be CONSERVATIVE (pruned scan
  * ≡ full scan for every predicate — the index accelerates, the filter
  * decides) and, over a z-ordered layout, actually selective (most
  * files skipped for a small box). */
class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = {
    val dir = Files.createTempDirectory("graft_sidx_").toString
    val df = spark.range(200000).select(
      pmod(hash(col("id")), lit(1024)).as("x"),
      pmod(hash(col("id") + 7919), lit(1024)).as("y"),
      col("id").as("payload"))
    ZOrder.write(df, s"$dir/data", Seq("x", "y"), bits = 10, numFiles = 24)
    StatsIndex.build(spark, s"$dir/data", Seq("x", "y"), s"$dir/idx")
    dir
  }

  test("pruned read equals the full-scan filter on random boxes") {
    val rnd = new scala.util.Random(4242)
    val full = spark.read.parquet(s"$base/data")
    (1 to 5).foreach { trial =>
      val (xLo, yLo) = (rnd.nextInt(900).toLong, rnd.nextInt(900).toLong)
      val w = 20 + rnd.nextInt(200)
      val ranges = Seq(("x", xLo, xLo + w), ("y", yLo, yLo + w))
      val pruned = StatsIndex.readPruned(spark, s"$base/data", s"$base/idx",
        ranges)
      val expect = full
        .filter(col("x").between(xLo, xLo + w) &&
          col("y").between(yLo, yLo + w))
      val (gotN, wantN) = (pruned.count(), expect.count())
      assert(gotN == wantN, s"trial $trial: $gotN rows pruned vs $wantN full")
      val gotSum = pruned.agg(sum(col("payload"))).head.getLong(0)
      val wantSum = expect.agg(sum(col("payload"))).head.getLong(0)
      assert(gotSum == wantSum, s"trial $trial: payload sums differ")
    }
  }

  test("a small box over the z-ordered layout skips most files") {
    val all = StatsIndex.prunedFiles(spark, s"$base/idx", Nil)
    assert(all.size >= 16, s"expected many files, got ${all.size}")
    val hit = StatsIndex.prunedFiles(spark, s"$base/idx",
      Seq(("x", 100L, 160L), ("y", 700L, 760L)))
    assert(hit.size < all.size / 2,
      s"box hit ${hit.size}/${all.size} files — index not selective")
  }

  test("refresh indexes only the churn and stays correct") {
    val dir = Files.createTempDirectory("graft_sidx_r_").toString
    val mk = (lo: Int, n: Int) => (lo until lo + n)
      .map(i => (i.toLong, (i * 3).toLong)).toDF("x", "payload")
    mk(0, 1000).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/data")
    StatsIndex.build(spark, s"$dir/data", Seq("x"), s"$dir/idx")
    val before = StatsIndex.prunedFiles(spark, s"$dir/idx", Nil)
    // append a file covering a disjoint x range
    mk(5000, 1000).coalesce(1).write.mode("append").parquet(s"$dir/data")
    val (added, removed) = StatsIndex.refresh(spark, s"$dir/data",
      Seq("x"), s"$dir/idx")
    assert(added == 1 && removed == 0, s"churn ($added, $removed)")
    val after = StatsIndex.prunedFiles(spark, s"$dir/idx", Nil)
    assert(after.size == before.size + 1)
    // the new range is found, and only through its own file
    val hit = StatsIndex.prunedFiles(spark, s"$dir/idx",
      Seq(("x", 5100L, 5200L)))
    assert(hit.size == 1, s"expected the appended file only, got $hit")
    val rows = StatsIndex.readPruned(spark, s"$dir/data", s"$dir/idx",
      Seq(("x", 5100L, 5200L))).count()
    assert(rows == 101)
    // remove the original file: refresh drops its index rows
    val gone = before.head
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(gone)
    p.getFileSystem(conf).delete(p, false)
    val (a2, r2) = StatsIndex.refresh(spark, s"$dir/data", Seq("x"),
      s"$dir/idx")
    assert(a2 == 0 && r2 == 1, s"churn ($a2, $r2)")
    assert(!StatsIndex.prunedFiles(spark, s"$dir/idx", Nil).contains(gone))
  }

  test("all-null column stats stay conservative: pruned == full filter") {
    val dir = Files.createTempDirectory("graft_sidx_n_").toString
    // file A: y entirely null (no stats) -> indexed full-range, kept;
    // file B: y populated
    spark.range(1000).select(col("id").as("x"),
      lit(null).cast("long").as("y"), col("id").as("payload"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    spark.range(1000, 2000).select(col("id").as("x"),
      (col("id") % 100).as("y"), col("id").as("payload"))
      .coalesce(1).write.mode("append").parquet(s"$dir/data")
    StatsIndex.build(spark, s"$dir/data", Seq("x", "y"), s"$dir/idx")
    val got = StatsIndex.readPruned(spark, s"$dir/data", s"$dir/idx",
      Seq(("y", 10L, 20L))).count()
    val want = spark.read.parquet(s"$dir/data")
      .filter(col("y").between(10, 20)).count()
    assert(got == want && want == 110, s"pruned $got vs full $want")
    // and the null file itself is never skipped (full-range row)
    val kept = StatsIndex.prunedFiles(spark, s"$dir/idx",
      Seq(("y", 10L, 20L)))
    assert(kept.size == 2, s"all-null file must be kept: $kept")
  }

  test("constraints on an unindexed column keep every file") {
    val all = StatsIndex.prunedFiles(spark, s"$base/idx", Nil)
    val kept = StatsIndex.prunedFiles(spark, s"$base/idx",
      Seq(("payload_missing", 0L, 10L)))
    assert(kept == all, "unindexed column must never prune")
  }
}
