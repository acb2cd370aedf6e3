package graft

class TuningSpec extends SparkSpec {

  private val bigCluster = Tuning.ClusterSpec(
    executors = 1000, coresPerExecutor = 8,
    memPerExecutorBytes = 32L * 1024 * 1024 * 1024)

  test("100 TB on 1000 executors: partitions scale with bytes, not 200") {
    val rec = Tuning.recommend(100L * 1024 * 1024 * 1024 * 1024, bigCluster)
    val parts = rec.confs("spark.sql.shuffle.partitions").toLong
    // 50 TB shuffled / 256 MB ≈ 200k partitions
    assert(parts > 100000L, s"partitions way too low for 100 TB: $parts")
    assert(rec.confs("spark.sql.adaptive.skewJoin.enabled") == "true")
    val mpb = rec.confs("spark.sql.files.maxPartitionBytes").toLong
    assert(mpb >= 64L * 1024 * 1024 && mpb <= 256L * 1024 * 1024)
  }

  test("small input still keeps every core busy") {
    val rec = Tuning.recommend(1L * 1024 * 1024 * 1024, bigCluster)
    val parts = rec.confs("spark.sql.shuffle.partitions").toLong
    assert(parts == 2L * 1000 * 8)
  }

  test("partition bytes bounded by the per-core memory slice") {
    val tiny = Tuning.ClusterSpec(10, 4, 2L * 1024 * 1024 * 1024)
    val rec = Tuning.recommend(10L * 1024 * 1024 * 1024, tiny)
    val mpb = rec.confs("spark.sql.files.maxPartitionBytes").toLong
    // 2 GB * 0.6 / 4 cores / 4 ≈ 76 MB — under the 256 MB ceiling
    assert(mpb < Tuning.TargetPartitionBytes)
  }
}
