package graft.bench

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.sources.{CommitLog, Occ, VectorIndex}

/** STREAMING ANN-INDEX UPKEEP cost (r11 VERDICT ask #8): `qs21` proved
  * refresh-per-trigger CORRECT (the incrementally maintained index
  * hash-matches the one-shot build) but no artifact isolated what the
  * per-trigger refresh COSTS as batch size varies. This harness drives
  * the qs21 loop — append a micro-batch to a seeded 200k×64 lake, then
  * [[VectorIndex.refresh]] — at three batch sizes with a fixed batch
  * count, measuring with the engine's own progress events:
  *
  *  - rows/s — streamed rows over the query's wall time;
  *  - p50/p95 per-trigger latency (`triggerExecution`, ms — covers
  *    the append AND the refresh);
  *  - the STATE-GROWTH flatness exponent (log-log slope of trigger
  *    latency on batch index): each refresh adds one segment to the
  *    manifest, and that accumulation must NOT bleed into later
  *    triggers' cost — slope near 0, the MoR sink's shape.
  *
  * The expected shape is FIXED-OVERHEAD-DOMINATED: a refresh pays a
  * churn-proportional assignment (batch × C cosines) plus a fixed
  * publish (segment write, meta, pointer flip, lock) that dwarfs it at
  * small batches — so p50 barely moves from 2k to 50k rows while
  * rows/s scales ~linearly with batch size. The sizing rule falls out:
  * size micro-batches so the assignment term is at least comparable to
  * the publish term, and fold segments periodically
  * ([[VectorIndex.compactSegments]]) on the maintenance schedule.
  * Results land in SCALE.md §"Streaming index upkeep". Run AFTER any
  * bench artifact (page-cache discipline):
  * `sbt "runMain graft.bench.StreamIndexUpkeepScale"`. */
object StreamIndexUpkeepScale {

  import BenchUtil.{rmrf, secs}

  private val Dim = 64
  private val Seeded = 200000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nBatches = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(12)
    val sizes = Seq(2000, 10000, 50000)

    def corpus(from: Long, until: Long) = spark.range(from, until)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Dim - 1)), j =>
          ((pmod(hash(col("id"), j), lit(100001)).cast("float") -
            lit(50000f)) / lit(50000f)).cast("float")).as("embedding"))

    def cell(batchRows: Int): String = {
      val root = s"/root/repo/target/scale/stream_vidx_$batchRows"
      rmrf(root)
      val lake = s"$root/lake"
      val idx = s"$root/vidx"
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      corpus(0L, Seeded).repartition(16).write.parquet(lake)
      CommitLog.commit(fs, lake, 0L,
        CommitLog.dataFileNames(fs, lake).toSeq.sorted)
      VectorIndex.build(spark, lake, idx, VectorIndex.Params(c = 64))
      // one parquet file per future micro-batch
      for (i <- 0 until nBatches) {
        corpus(Seeded + i.toLong * batchRows,
          Seeded + (i.toLong + 1) * batchRows)
          .coalesce(1).write.mode("append").parquet(s"$root/in")
      }
      val schema = spark.read.parquet(s"$root/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val batchMs = new ConcurrentLinkedQueue[(Long, Long)]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (p.numInputRows > 0) {
            batchMs.add((p.batchId,
              p.durationMs.getOrDefault("triggerExecution", 0L)))
            ()
          }
        }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val refreshed = new java.util.concurrent.atomic.AtomicLong(0L)
      val wall = secs {
        val q = stream.writeStream
          .option("checkpointLocation", s"$root/ckp")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            if (Occ.append(batch.sparkSession, lake, batch) >= 0L) {
              val (_, rows) =
                VectorIndex.refresh(batch.sparkSession, lake, idx)
              refreshed.addAndGet(rows); ()
            }
          }
          .start()
        q.awaitTermination()
      }
      spark.streams.removeListener(listener)
      val rows = batchRows.toLong * nBatches
      require(refreshed.get() == rows,
        s"refresh covered ${refreshed.get()} of $rows streamed rows")
      // the maintained index answers, and covers the streamed rows
      val qvec = corpus(Seeded, Seeded + 1L).select(col("embedding"))
        .head.getSeq[Float](0)
      require(VectorIndex.query(spark, lake, idx, qvec, k = 10,
        probes = 8).count() == 10L)
      import scala.jdk.CollectionConverters._
      val ds = batchMs.iterator().asScala.toSeq.sortBy(_._1)
        .map(_._2.toDouble)
      def pct(p: Double): Double = {
        val s = ds.sorted
        s(math.min(s.size - 1, (p * s.size).toInt))
      }
      val pts = ds.zipWithIndex.map { case (d, i) =>
        (math.log(i + 1.0), math.log(math.max(d, 1.0))) }
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / math.max(n * sxx - sx * sx, 1e-9)
      f""""b$batchRows":{"rows_per_s":${rows / wall}%.0f,""" +
        f""""wall_s":$wall%.2f,"p50_ms":${pct(0.5)}%.0f,""" +
        f""""p95_ms":${pct(0.95)}%.0f,"batches":${ds.size},""" +
        f""""flatness_slope":$slope%.3f}"""
    }

    val cells = sizes.map(cell)
    println(
      s"""{"metric":"stream_index_upkeep","n_batches":$nBatches,""" +
        s""""seeded":$Seeded,"dim":$Dim,"c":64,""" +
        cells.mkString(",") + "}")
    spark.stop()
  }
}
