package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, Occ, VectorIndex}

/** PERSISTED-ANN-INDEX lifecycle costs at corpus scale (the r11
  * `VectorIndex` claims, measured): over a synthetic 200k × dim-64
  * float corpus (deterministic hash-derived components — the driver's
  * `embeddings` table is 5k rows at sf0.1, too small to time), one
  * cell each for:
  *
  *  - BUILD — the one-time N·C assignment pass + PQ encode + publish;
  *  - REFRESH at 2% churn — the per-ingest maintenance the index
  *    amortizes to (claim: cost ∝ churn, so refresh/build ≈ the churn
  *    fraction plus the fixed publish overhead, nowhere near 1);
  *  - QUERY — the probe-pruned read (claim: independent of build
  *    cost; milliseconds-class against the corpus scan).
  *
  * Emits one JSON line; results land in SCALE.md §"Vector index
  * lifecycle". Run AFTER any bench artifact (page-cache discipline):
  * `sbt "runMain graft.bench.VectorIndexScale [nVectors]"`. */
object VectorIndexScale {

  import BenchUtil.{rmrf, secs}

  def main(args: Array[String]): Unit = {
    val n = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toLong).getOrElse(200000L)
    val dim = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = "/root/repo/target/scale/vidx"
    rmrf(root)
    val lake = s"$root/lake"
    val idx = s"$root/vidx"
    // deterministic synthetic corpus: component j of vector i derives
    // from hash(i, j) — uniform in [-1, 1), reproducible, no RNG
    def corpus(from: Long, until: Long) = spark.range(from, until)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          ((pmod(hash(col("id"), j), lit(100001)).cast("float") -
            lit(50000f)) / lit(50000f)).cast("float")).as("embedding"))
    val churn1 = n / 50 // 2%
    val churn2 = n / 10 // 10% — the second point that separates the
    //                       fixed publish overhead from the ∝churn term
    val base = n - churn1 - churn2
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    corpus(0L, base).repartition(16).write.parquet(lake)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    // JIT/page warm: a small throwaway build
    val warmIdx = s"$root/warm"
    VectorIndex.build(spark, lake, warmIdx,
      VectorIndex.Params(c = 4, pqM = 8))
    val tBuild = secs {
      VectorIndex.build(spark, lake, idx,
        VectorIndex.Params(c = 64, pqM = 8))
    }
    require(Occ.append(spark, lake, corpus(base, base + churn1),
      numFiles = 1) > 0L)
    var refreshed = (0, 0L)
    val tRefresh = secs { refreshed = VectorIndex.refresh(spark, lake, idx) }
    require(refreshed._2 == churn1, s"refresh covered ${refreshed._2}")
    require(Occ.append(spark, lake, corpus(base + churn1, n),
      numFiles = 1) > 0L)
    var refreshed2 = (0, 0L)
    val tRefresh2 = secs {
      refreshed2 = VectorIndex.refresh(spark, lake, idx)
    }
    require(refreshed2._2 == churn2, s"refresh2 covered ${refreshed2._2}")
    val qvec = corpus(0L, 1L).select(col("embedding"))
      .head.getSeq[Float](0)
    // one untimed query to JIT the probe path, then the timed one
    VectorIndex.query(spark, lake, idx, qvec, k = 10, probes = 8)
      .collect()
    var rows = 0L
    val tQuery = secs {
      rows = VectorIndex.query(spark, lake, idx, qvec, k = 10,
        probes = 8).count()
    }
    require(rows == 10L)
    var rowsPq = 0L
    val tQueryPq = secs {
      rowsPq = VectorIndex.queryPq(spark, lake, idx, qvec.toArray,
        k = 10, probes = 8, shortlist = 200).count()
    }
    require(rowsPq == 10L)
    println(f"""{"metric":"vector_index_lifecycle","n":$n,"dim":$dim,""" +
      f""""c":64,"build_s":$tBuild%.2f,""" +
      f""""refresh_2pct_s":$tRefresh%.2f,""" +
      f""""refresh_10pct_s":$tRefresh2%.2f,""" +
      f""""refresh_2pct_over_build":${tRefresh / tBuild}%.3f,""" +
      f""""query_s":$tQuery%.2f,"query_pq_s":$tQueryPq%.2f}""")
  }
}
