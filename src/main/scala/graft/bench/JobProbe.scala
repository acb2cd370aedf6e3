package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB time attribution for a single catalog query (guide §1: find
  * where the wall actually goes before touching anything). Registers a
  * listener recording every job's callsite + duration, runs the named
  * query once (steady-state: one untimed warmup at sf0.001 first),
  * and prints jobs sorted by duration. Usage:
  *
  *   sbt "runMain graft.bench.JobProbe q87_merge_clauses [sfDir]"
  */
object JobProbe {

  final case class JobRow(id: Int, started: Long,
      @volatile var ended: Long = -1L, site: String)

  def main(args: Array[String]): Unit = {
    // comma-separated names run IN SEQUENCE in one session (bisecting
    // session-state contamination between queries); the LAST one is
    // the probed query, the earlier ones just execute
    val names = args.headOption.getOrElse("q87_merge_clauses")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val name = names.last
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // untimed warmup at the smallest SF: JIT + catalyst paths
    try fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
    catch { case t: Throwable => println(s"[probe] warmup failed: $t") }
    spark.sharedState.cacheManager.clearCache()
    // predecessors (untimed): reproduce session-state effects
    names.dropRight(1).foreach { p =>
      try {
        graft.SparkEntry.queries(p)(spark, sfDir)
          .queryExecution.toRdd.count(): Unit
        println(s"[probe] predecessor $p ok")
      } catch { case t: Throwable =>
        println(s"[probe] predecessor $p FAILED: $t")
      }
      spark.sharedState.cacheManager.clearCache()
    }

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties).map { p =>
          Seq("callSite.short", "spark.job.description",
            "spark.sql.execution.root.id")
            .flatMap(k => Option(p.getProperty(k))).mkString(" | ")
        }.filter(_.nonEmpty).getOrElse(
          e.stageInfos.headOption.map(_.name).getOrElse("?"))
        jobs.put(e.jobId, JobRow(e.jobId, e.time, site = site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.ended = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // executed-plan capture per SQL execution: join strategy + exchange
    // count are what the job counts above can only hint at
    if (sys.env.get("JOBPROBE_PLANS").contains("1")) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val p = qe.executedPlan.toString
            val joins = p.linesIterator.filter(l =>
              l.contains("Join") || l.contains("Exchange")).take(12)
            println(f"[plan] $funcName ${durationNs / 1e9}%.2fs " +
              joins.mkString("\n[plan]    ", "\n[plan]    ", ""))
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
    val t0 = System.nanoTime()
    fn(spark, sfDir).queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain

    import scala.jdk.CollectionConverters._
    val rows = jobs.values().asScala.toSeq.sortBy(_.id)
    val done = rows.filter(_.ended > 0)
    val totalJob = done.map(r => r.ended - r.started).sum / 1e3
    println(f"[probe] $name wall=$wall%.2fs jobs=${rows.size} " +
      f"job-time-sum=$totalJob%.2fs (gaps = driver/planning/FS time)")
    // chronological, with per-job duration — shows phases AND stragglers
    var lastEnd = 0L
    done.foreach { r =>
      val dur = (r.ended - r.started) / 1e3
      val gap = if (lastEnd == 0) 0.0 else (r.started - lastEnd) / 1e3
      lastEnd = math.max(lastEnd, r.ended)
      println(f"[probe]   job ${r.id}%3d ${dur}%7.3fs gap=${gap}%6.3fs  ${r.site}")
    }
    spark.stop()
  }
}
