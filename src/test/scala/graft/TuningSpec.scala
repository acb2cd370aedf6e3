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

  test("runtime bloom filter injects into a selective shuffle join") {
    // at 100 TB a selective dim filter should row-filter the FACT scan
    // before the shuffle (Catalyst's InjectRuntimeFilter); this pins
    // that our plans remain eligible — shuffle join, filter on the
    // creation side, plain equi-keys — with the thresholds a real
    // cluster config would set
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_")
      .toString
    spark.range(500000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(5000)
      .select(col("id").as("k"), (col("id") % 7).as("tag"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val restore = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "1") // local parquet is tiny; a cluster's scan exceeds the default
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === 3)
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.contains("bloom_filter") || plan.contains("might_contain"),
        s"no runtime bloom filter in:\n${plan.take(1500)}")
      assert(joined.count() == 714) // ids ≡ 3 (mod 7) in [0, 5000)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
