package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.{StatsIndex, ZOrder}

/** Streaming ingest that lands CLUSTERED, INDEXED data — the shape a
  * 100 TB lake actually ingests with: every micro-batch is z-ordered
  * before it touches disk (files are scan-prunable from birth, no
  * "ingest now, OPTIMIZE later" window where queries full-scan fresh
  * data), and the per-file min/max stats index is refreshed after each
  * batch, so [[StatsIndex.readPruned]] never lags the lake.
  *
  * Cost shape per batch: one range exchange + per-file sort on the
  * BATCH (not the lake), then an index refresh that footer-reads only
  * the batch's new files ([[StatsIndex.refresh]] cost ∝ churn).
  * Z-locality is per-batch; cross-batch consolidation is a separate
  * compaction pass (the standard ingest/OPTIMIZE split).
  *
  * Delivery: `foreachBatch` is at-least-once across failures — a batch
  * retried after a crash mid-write can leave duplicate files. The
  * transactional fix is a commit log (what Delta's log provides); this
  * sink documents the boundary rather than hiding it. Within a healthy
  * run (the spec's scope, and AvailableNow drains) each batch lands
  * exactly once.
  */
object LayoutSink {

  def start(stream: DataFrame, lakeDir: String, indexDir: String,
      checkpointDir: String, zCols: Seq[String], bits: Int = 10,
      filesPerBatch: Int = 2, curve: String = "morton"): StreamingQuery = {
    // fail fast on misconfiguration — an invalid curve name or arity
    // must reject HERE, not kill the query when the first non-empty
    // batch reaches curveWrite mid-ingest
    require(curve == "morton" || curve == "hilbert",
      s"unknown curve '$curve' (morton | hilbert)")
    require(curve != "hilbert" || zCols.size == 2,
      s"hilbert curve is 2-D; got ${zCols.size} columns")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist once: the emptiness probe, the curve write's min/max
        // aggregate and the parquet write are three separate actions —
        // uncached they would re-read the batch's source files 3×
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            ZOrder.curveWrite(b, lakeDir, zCols, bits,
              numFiles = filesPerBatch, mode = "append", curve = curve)
            StatsIndex.refresh(b.sparkSession, lakeDir, zCols, indexDir)
            ()
          }
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
