package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.streaming.IncrementalDedup

/** The incremental streaming LSH index must be batching-invariant:
  * whatever the micro-batch split, the deduped pair union equals the
  * one-shot batch LSH candidate set. */
class IncrementalDedupSpec extends SparkSpec {

  test("incremental streaming LSH == one-shot batch LSH, any batching") {
    val docs = spark.read.parquet(sf("documents"))
    val batchPairs = Dedup.lshCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty)
    for (nFiles <- Seq(1, 4)) {
      val work = Files.createTempDirectory(s"graft_incd_$nFiles").toString
      docs.repartition(nFiles).write.mode("overwrite")
        .parquet(s"$work/in")
      val schema = spark.read.parquet(s"$work/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
      val q = IncrementalDedup.start(stream,
        s"$work/idx", s"$work/pairs", s"$work/ckp")
      q.awaitTermination()
      val got = IncrementalDedup.pairs(spark, s"$work/pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batchPairs,
        s"$nFiles-batch incremental run diverges from batch LSH: " +
          s"missing ${batchPairs -- got}, extra ${got -- batchPairs}")
    }
  }
}
