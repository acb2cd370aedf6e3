package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.CommitLog

/** Streaming TRIGGER-SIZE amortization (r7 VERDICT ask #7): SCALE.md's
  * honest finding is that the streaming cells (qs5/qs14/qs15) are
  * FIXED-COST dominated at 10× — per micro-batch the engine pays a
  * planning/commit overhead that dwarfs tiny batches. The prescribed
  * knob is the batch size: the file source's `maxFilesPerTrigger`
  * (files ingested per micro-batch). This main MEASURES the
  * amortization curve for the two stateful ingest sinks — the
  * clustered-layout sink ([[graft.streaming.LayoutSink]]) and the
  * MERGE upsert sink ([[graft.streaming.UpsertSink]]) — each over its
  * own 16-file input (the full corpus for the layout sink; the ~1/3
  * update slice for the upsert sink), at `maxFilesPerTrigger` ∈
  * {1, 4, 16} (16, 4 and 1 micro-batches respectively): each sink's
  * total rows are constant across trigger sizes, so wall time falling
  * with batch size IS the per-row cost dropping, and the per-1k-row
  * cost column — divided by EACH SINK'S OWN row count — makes the
  * curve explicit (the two sinks' absolute per-row numbers are not
  * comparable to each other; the CURVES are the result).
  *
  * The sizing rule this measures: pick the LARGEST trigger batch the
  * latency budget allows — per-batch overhead (source listing, plan,
  * lock, commit, index refresh) is amortized over the batch's rows,
  * while per-row work is batch-size-invariant.
  *
  * Run AFTER any bench artifact is written (page-cache discipline):
  * `sbt "runMain graft.bench.StreamBatchScale"`.
  * Results land in SCALE.md §"Streaming trigger sizing".
  */
object StreamBatchScale {

  import BenchUtil.{rmrf, secs => t}

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val root = "/root/repo/target/scale/stream_trigger"
    rmrf(root)

    // shared input: documents split into 16 files (constant total
    // rows; only the files-per-trigger knob varies)
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(16).write.parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    val nRows = spark.read.parquet(s"$root/in").count()
    def stream(fpt: Int) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", fpt.toString)
      .parquet(s"$root/in")

    def layoutRun(fpt: Int, tag: String): Double = t {
      val q = graft.streaming.LayoutSink.start(stream(fpt),
        s"$root/$tag/lake", s"$root/$tag/idx", s"$root/$tag/ckp",
        Seq("doc_id", "n_chars"))
      q.awaitTermination()
    }

    def upsertRun(fpt: Int, tag: String): (Double, Long) = {
      // fresh base lake per run: 3 committed files, every doc present
      val lake = s"$root/$tag/lake"
      val fs = new Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      docs.withColumn("score", col("n_chars"))
        .repartition(3).write.parquet(lake)
      CommitLog.commit(fs, lake, 0L,
        CommitLog.dataFileNames(fs, lake).toSeq.sorted)
      // the update stream re-scores every third doc (16 files like
      // the layout input, so the trigger knob yields the same batch
      // counts; FEWER rows than the layout stream — per-row costs
      // divide by THIS stream's own count, never the layout's)
      docs.filter(col("doc_id") % 3 === 0)
        .withColumn("score", col("n_chars") * 2)
        .repartition(16).write.parquet(s"$root/$tag/in")
      val urows = spark.read.parquet(s"$root/$tag/in").count()
      val uschema = spark.read.parquet(s"$root/$tag/in").schema
      val ustream = spark.readStream.schema(uschema)
        .option("maxFilesPerTrigger", fpt.toString)
        .parquet(s"$root/$tag/in")
      val sec = t {
        val q = graft.streaming.UpsertSink.start(ustream, lake,
          s"$root/$tag/ckp", Seq("doc_id"))
        q.awaitTermination()
      }
      (sec, urows)
    }

    // JIT-warm both paths untimed (tiny trigger on the same input —
    // compiles streaming, layout, merge code paths)
    layoutRun(16, "warm_layout"): Unit
    upsertRun(16, "warm_upsert"): Unit

    println("""{"probe":"stream_trigger","layout_rows":""" + nRows +
      ""","cells":[""")
    // leading comma on every element but the first keeps the streamed
    // progress output valid JSON (no trailing comma after the last)
    for ((fpt, i) <- Seq(1, 4, 16).zipWithIndex) {
      val batches = 16 / fpt
      val lSec = layoutRun(fpt, s"layout_$fpt")
      val (uSec, uRows) = upsertRun(fpt, s"upsert_$fpt")
      val l = f"""{"files_per_trigger":$fpt,"batches":$batches,""" +
        f""""layout_sec":$lSec%.2f,""" +
        f""""layout_ms_per_1k":${lSec * 1e6 / nRows}%.1f,""" +
        f""""upsert_sec":$uSec%.2f,"upsert_rows":$uRows,""" +
        f""""upsert_ms_per_1k":${uSec * 1e6 / uRows}%.1f}"""
      println("  " + (if (i > 0) "," else "") + l)
    }
    println("]}")
    println("[stream_trigger] done")
    spark.stop()
  }
}
