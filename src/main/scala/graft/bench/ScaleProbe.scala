package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{FeaturePipeline, GlobalWindow}

/** Scaling probe: times the DATA PLANE (scalable label + feature
  * pipeline, no ML training) at 1× and 10× the reference row count.
  * Near-linear growth is the evidence that the plans have no
  * super-linear stage (global sorts, quadratic joins) hiding at the
  * bench's default scale. Results quoted in SCALE.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(nRows: Long): (Double, Double) = {
      val path = SyntheticBars.ensure(spark, nRows)
      // warm the page cache so both scales measure compute, not first-read
      spark.read.parquet(path).queryExecution.toRdd.count()
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val fe = t {
        FeaturePipeline.fast(spark.read.parquet(path))
          .queryExecution.toRdd.count()
      }
      val label = t {
        GlobalWindow.lagLabelGlobal(spark.read.parquet(path), Seq("date"),
          bucketKey = unix_micros(col("date")))
          .queryExecution.toRdd.count()
      }
      (label, fe)
    }
    run(SyntheticBars.ReferenceRows) // JIT warmup pass, discarded
    val (l1, f1) = run(SyntheticBars.ReferenceRows)
    val (l10, f10) = run(SyntheticBars.ReferenceRows * 10)
    println(f"[scale-probe] label 1x: $l1%.1f s   10x: $l10%.1f s   ratio ${l10 / l1}%.1f")
    println(f"[scale-probe] fe    1x: $f1%.1f s   10x: $f10%.1f s   ratio ${f10 / f1}%.1f")
    spark.stop()
  }
}
