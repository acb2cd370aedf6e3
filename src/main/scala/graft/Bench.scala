package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every catalog query on
  * `SPARK_GRAFT_SF_DIR`, plus the end-to-end pipeline cells that mirror
  * BASELINE.md's published runtimes at the reference's own scale
  * (671,024×60 synthetic bars; disable with SPARK_GRAFT_E2E=0). Emits ONE
  * JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runE2e = sys.env.getOrElse("SPARK_GRAFT_E2E", "1") != "0"
    // optional comma-separated query-name filter for spot measurements
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + filesystem caches, so the first timed query isn't
    // charged for session spin-up
    try { SparkEntry.entry(spark).queryExecution.toRdd.count() }
    catch { case _: Throwable => () }
    // the streaming engine (MicroBatchExecution, state stores) has its own
    // multi-second first-use class-load/JIT cost — pay it once, untimed,
    // at the smallest SF so the first timed qs* query measures steady state
    try {
      SparkEntry.queries("qs1_stream_daily")(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
      spark.sharedState.cacheManager.clearCache()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() executes the full physical plan including the final
      // projection — a plain count() would let Catalyst prune every
      // projection-only query down to a row count
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolate measurements: drop caches the query left behind
      spark.sharedState.cacheManager.clearCache()
      name -> dt
    }
    val e2e: Map[String, Double] =
      if (!runE2e) Map.empty
      else {
        val path = bench.SyntheticBars.ensure(spark) // untimed, write-once
        bench.E2EBench.cells.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, path) } catch { case _: Throwable => () }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sharedState.cacheManager.clearCache()
          name -> dt
        }
      }
    val all = results ++ e2e
    val qs = all.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (all.nonEmpty) all.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
