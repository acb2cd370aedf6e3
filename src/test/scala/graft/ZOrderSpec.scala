package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bit interleave on the driver. */
  private def ref(vals: Seq[Long], bits: Int): Long = {
    var out = 0L
    val n = vals.size
    for (d <- vals.indices; j <- 0 until bits)
      out |= (((vals(d) >> j) & 1L) << (j * n + d))
    out
  }

  test("interleave matches the reference bit weave") {
    val cases = Seq((5L, 3L), (0L, 7L), (255L, 0L), (170L, 85L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.interleave(Seq($"x", $"y"), 8).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => ref(Seq(x, y), 8) })
  }

  test("z-ordered files cover a narrow range of EVERY z column") {
    val dir = Files.createTempDirectory("graft_zo_").toString + "/t"
    // two independent uniform dimensions — a single-key clustered write
    // would leave the other dimension full-range in every file
    val in = (0 until 20000).map { i =>
      val x = (i * 7919) % 1000L
      val y = (i * 104729) % 1000L
      (x, y, i.toLong)
    }.toDF("x", "y", "payload")
    ZOrder.write(in, dir, Seq("x", "y"), bits = 10, numFiles = 16)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"),
        (max($"y") - min($"y")).as("sy"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.length > 4, "expected multiple files")
    // Z-curve locality: the AVERAGE per-file span of each dimension must
    // be well under the global range (1000); a non-z layout leaves one
    // dimension at ~full range in every file
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    assert(avgX < 600, s"x span not localised: $avgX")
    assert(avgY < 600, s"y span not localised: $avgY")
  }

  test("z-order write preserves the rows exactly") {
    val dir = Files.createTempDirectory("graft_zo2_").toString + "/t"
    val in = (0 until 5000)
      .map(i => ((i * 31) % 97L, (i * 17) % 89L, i.toLong))
      .toDF("a", "b", "v")
    ZOrder.write(in, dir, Seq("a", "b"), bits = 8, numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(sum($"v")).head.getLong(0) ==
      in.agg(sum($"v")).head.getLong(0))
  }
}
