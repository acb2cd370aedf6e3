package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Incremental near-dup detection over a document STREAM — the online
  * form of the LSH pipeline: each micro-batch's banded MinHash
  * signatures are probed against the accumulated signature INDEX (all
  * previously seen documents) plus the batch itself, candidate pairs
  * are appended, and the batch's signatures join the index.
  *
  * Invariant (spec- and oracle-checked): the union of emitted pairs
  * over any batching of the corpus equals the one-shot batch LSH pair
  * set — arrival order and micro-batch boundaries don't change the
  * result, because bucket co-membership is symmetric and every pair is
  * seen when its LATER member arrives.
  *
  * Scale shape: per batch, ONE equi-join of the batch's banded rows
  * (small) against the index on (band, band_key) — the batch side
  * broadcasts; the index is a partitioned parquet table that only ever
  * appends. The quadratic work is confined to buckets, as in the batch
  * form. At 100 TB the index would be bucketed by (band, band_key) so
  * the probe prunes to matching buckets.
  */
object IncrementalDedup {

  /** Process one micro-batch: emit new candidate pairs (id_a < id_b),
    * then fold the batch into the index. Idempotence note: reprocessing
    * a batch re-emits the same pairs; the reader dedups (`distinct`),
    * so at-least-once foreachBatch semantics stay correct. */
  def processBatch(batch: DataFrame, indexPath: String,
      pairsPath: String): Unit = {
    val spark = batch.sparkSession
    // banded rows computed ONCE per batch (joined twice below)
    val newBanded = Dedup.bandedSignatures(batch).localCheckpoint()
    val withinNew = newBanded.as("a").join(newBanded.as("b"),
      col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val priorPairs =
      if (new java.io.File(indexPath).exists()) {
        val prior = spark.read.parquet(indexPath)
        newBanded.as("a").join(prior.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_key") === col("b.band_key"))
          .select(least(col("a.id"), col("b.id")).as("id_a"),
            greatest(col("a.id"), col("b.id")).as("id_b"))
      } else withinNew.limit(0)
    withinNew.unionByName(priorPairs).distinct()
      .write.mode("append").parquet(pairsPath)
    newBanded.write.mode("append").parquet(indexPath)
  }

  /** Wire a document stream through [[processBatch]]. */
  def start(docsStream: DataFrame, indexPath: String, pairsPath: String,
      checkpointDir: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, indexPath, pairsPath)
      }
      .trigger(Trigger.AvailableNow()).start()

  /** The accumulated candidate-pair set (deduped across batches). */
  def pairs(spark: org.apache.spark.sql.SparkSession,
      pairsPath: String): DataFrame =
    spark.read.parquet(pairsPath)
      .select(col("id_a"), col("id_b")).distinct()
}
