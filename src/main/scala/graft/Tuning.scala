package graft

import org.apache.spark.sql.SparkSession

/** Conf sizing for a target data scale (builder brief: "size
  * spark.sql.shuffle.partitions and spark.sql.files.maxPartitionBytes so
  * partitions fit in executor memory at the target SF").
  *
  * The rules of thumb encoded here, with the arithmetic visible:
  *  - shuffle partitions ≈ shuffled bytes / targetPartitionBytes, floored
  *    at 2× total cores (all cores busy, headroom for stragglers) — at
  *    100 TB with 1000 × 8-core executors that is ~400k partitions of
  *    256 MB, NOT the 200 default;
  *  - maxPartitionBytes stays at 128–256 MB: scan parallelism follows
  *    file splits, and partitions must fit comfortably in
  *    (executor memory × memoryFraction / cores);
  *  - AQE on: it coalesces over-partitioned shuffles and splits skewed
  *    joins at runtime, so the static number only needs the right order
  *    of magnitude;
  *  - broadcast threshold sized to a fraction of executor memory — a
  *    10 MB default leaves broadcastable dimension tables shuffling.
  */
object Tuning {

  final case class ClusterSpec(
      executors: Int,
      coresPerExecutor: Int,
      memPerExecutorBytes: Long)

  final case class Recommendation(confs: Map[String, String]) {
    def applyTo(spark: SparkSession): Unit =
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  val TargetPartitionBytes: Long = 256L * 1024 * 1024

  def recommend(inputBytes: Long, cluster: ClusterSpec,
      shuffleFraction: Double = 0.5): Recommendation = {
    val totalCores = cluster.executors.toLong * cluster.coresPerExecutor
    val shuffledBytes = (inputBytes * shuffleFraction).toLong
    val byBytes = math.max(1L, shuffledBytes / TargetPartitionBytes)
    val shufflePartitions = math.max(byBytes, totalCores * 2)
    // a partition must fit in the per-core execution memory slice
    val perCoreMem =
      (cluster.memPerExecutorBytes * 0.6 / cluster.coresPerExecutor).toLong
    val maxPartitionBytes =
      math.min(TargetPartitionBytes, math.max(64L * 1024 * 1024,
        perCoreMem / 4))
    val broadcastBytes = math.min(512L * 1024 * 1024,
      cluster.memPerExecutorBytes / 16)
    Recommendation(Map(
      "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
      "spark.sql.files.maxPartitionBytes" -> maxPartitionBytes.toString,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // runtime Bloom-filter pruning: a selective join's build side
      // injects a Bloom filter into the probe-side scan — at 100 TB
      // this skips row groups before the shuffle, the runtime analogue
      // of static partition pruning
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> broadcastBytes.toString))
  }

  /** The local test/bench shape used by Verify/Bench: partitions = cores
    * (tiny inputs — anything more is scheduling overhead). */
  def local(cores: Int): Recommendation = Recommendation(Map(
    "spark.sql.shuffle.partitions" -> cores.toString,
    "spark.sql.adaptive.enabled" -> "true"))
}
