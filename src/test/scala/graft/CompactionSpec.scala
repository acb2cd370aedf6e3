package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges fragmented partitions, preserves rows and layout") {
    val dir = Files.createTempDirectory("graft_cmp_").toString + "/t"
    // fragment: 24 files per day partition
    val in = (0 until 6000)
      .map(i => (s"d${i % 3}", i.toLong, i * 0.5))
      .toDF("day", "id", "v")
    in.repartition(24).write.partitionBy("day").parquet(dir)
    val before = Compaction.partitionStats(spark, dir)
    assert(before.size == 3 && before.forall(_._2 > 4),
      s"fixture should be fragmented: $before")

    val rewritten = Compaction.compact(spark, dir,
      targetBytes = 1L << 30, maxFilesPerPartition = 4)
    assert(rewritten.toSet == Set("day=d0", "day=d1", "day=d2"))
    val after = Compaction.partitionStats(spark, dir)
    assert(after.forall(_._2 == 1), s"expected 1 file per partition: $after")

    val back = spark.read.parquet(dir)
    assert(back.count() == 6000)
    assert(back.agg(sum($"id")).head.getLong(0) ==
      in.agg(sum($"id")).head.getLong(0))
    assert(back.select($"day").distinct().count() == 3)
  }

  test("partitions under the file threshold are left untouched") {
    val dir = Files.createTempDirectory("graft_cmp2_").toString + "/t"
    val in = (0 until 100).map(i => (s"d${i % 2}", i.toLong)).toDF("day", "id")
    in.coalesce(2).write.partitionBy("day").parquet(dir)
    val before = Compaction.partitionStats(spark, dir)
    val rewritten = Compaction.compact(spark, dir,
      maxFilesPerPartition = 4)
    assert(rewritten.isEmpty)
    assert(Compaction.partitionStats(spark, dir) == before)
  }
}
