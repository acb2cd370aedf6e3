package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** LSH PAIR-GENERATION under bucket saturation (r11 VERDICT ask #1's
  * measurement half; `LshSkewSpec` pins the semantics): wall-time of
  * [[Dedup.lshCandidatePairs]] with the default `maxBucket` cap as a
  * growing fraction of the corpus is BOILERPLATE — one identical text
  * hitting the same (band, band_key) bucket in every band. Corpus size
  * is FIXED; only the saturated fraction grows, so a flat wall-time
  * row is direct evidence the cap drops the saturated mass BEFORE the
  * `collect_list` (uncapped, the 50% point alone would emit ~4×10⁹
  * in-bucket pairs per band and OOM the aggregation buffer first).
  * The un-saturated remainder carries a planted exact-dup pair signal
  * (docs 2i/2i+1 share their text) so pair generation itself stays
  * non-trivial and the pair count tracks the survivors.
  *
  * Emits one JSON line; results land in SCALE.md §"LSH bucket
  * saturation". Run AFTER any bench artifact (page-cache discipline):
  * `sbt "runMain graft.bench.LshSkewScale [nDocs]"`. */
object LshSkewScale {

  import BenchUtil.secs

  def main(args: Array[String]): Unit = {
    val n = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // doc i < cut: ten words derived from hash(i/2, j) — docs 2i and
    // 2i+1 are exact dups, every dup pair shares all 8 band keys.
    // doc i >= cut: the one boilerplate string — the saturated bucket.
    def corpus(saturatedFrac: Double) = {
      val cut = (n * (1.0 - saturatedFrac)).toLong
      spark.range(n).select(col("id").as("doc_id"),
        when(col("id") < cut,
          concat_ws(" ", (0 until 10).map(j =>
            pmod(hash((col("id") / 2).cast("long"), lit(j)),
              lit(1000000)).cast("string")): _*))
          .otherwise(lit("lorem ipsum boilerplate header footer " +
            "navigation cookie banner terms conditions"))
          .as("text"))
    }

    // JIT warm on a small slice
    Dedup.lshCandidatePairs(corpus(0.1).limit(5000), "doc_id", "text")
      .count()

    val cells = Seq(0.0, 0.1, 0.3, 0.5).map { f =>
      var pairs = 0L
      val wall = secs {
        pairs = Dedup.lshCandidatePairs(corpus(f), "doc_id", "text")
          .count()
      }
      f""""sat${(f * 100).toInt}":{"wall_s":$wall%.2f,"pairs":$pairs}"""
    }
    println(s"""{"metric":"lsh_skew_pairs","n_docs":$n,""" +
      s""""max_bucket":"default(1000)",""" +
      cells.mkString(",") + "}")
    spark.stop()
  }
}
