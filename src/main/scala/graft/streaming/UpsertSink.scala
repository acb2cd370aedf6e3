package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.{DeletionVectors, IncrementalView, MergeInto}

/** Streaming UPSERT into a commit-logged lake: each micro-batch is
  * MERGEd ([[graft.sources.MergeInto.merge]] — whenMatched replace,
  * whenNotMatched insert) under the lake's single writer lock, so a
  * CDC-style key-update stream maintains a point-lookup-able table
  * instead of an append log the reader must last-wins-collapse at
  * query time. This is the Delta `foreachBatch + MERGE` streaming
  * upsert pattern as a first-class sink.
  *
  * Exactly-once: a merge is IDEMPOTENT in the batch's content — a
  * replayed batch (restart between the merge and the checkpoint
  * commit) re-replaces the same keys with the same rows and
  * re-inserts over its own inserts, converging to the identical table
  * version (`MergeIntoSpec` replays a whole stream from a wiped
  * checkpoint and asserts the lake is unchanged). The cross-batch
  * contract the caller owes is Delta's: a key may recur ACROSS
  * batches (later batch wins — micro-batches run in order), but rows
  * within one batch must be key-unique (merge fails fast otherwise).
  *
  * Scale shape: per batch, touched-file discovery is a column-pruned
  * semi-join collecting at most #files names; only files holding a
  * matched key are rewritten, everything else is carried by name with
  * zero I/O — a small update batch against a 100 TB lake costs
  * O(matched files), not O(table). */
object UpsertSink {

  /** A materialized aggregate the sink maintains PER BATCH:
    * `GROUP BY groupCols → count(*) AS n, sum(c) AS sum_c…`,
    * advanced by [[graft.sources.IncrementalView.refresh]] after each
    * batch's upsert publishes. Pair it with `mor = true`: MoR batches
    * never rewrite a committed file, so every refresh after the first
    * runs INCREMENTALLY off the row-level change feed — per-batch
    * view cost ∝ batch churn. (Under CoW batches each merge rewrites
    * files, tripping the feed guard — refresh still converges, but by
    * full rebuild every batch.) */
  final case class ViewSpec(viewDir: String, groupCols: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String] = Nil)

  /** With `indexDir`, each batch's merge also keeps the lake's stats
    * index consistent (and uses it for touched-file discovery) — the
    * streaming twin of [[graft.streaming.LayoutSink]]'s per-batch
    * refresh.
    *
    * With `mor = true`, each batch upserts MERGE-ON-READ
    * ([[graft.sources.DeletionVectors.mergeMor]]): matched rows'
    * positions die in the `_dv` sidecar, the batch appends as one
    * delta file, ZERO data files rewrite — per-batch cost O(batch
    * churn) instead of O(touched file bytes), the shape a
    * high-frequency CDC stream against a 100 TB lake needs. The table
    * is then read through `DeletionVectors.readMor` (NOT the plain
    * committed read), and `compact` folds the sidecar back to plain
    * files off the hot path. Replay idempotence holds in VIEW space:
    * a replayed batch marks its own previous delta rows dead and
    * appends identical replacements — `readMor` converges to the
    * identical table (the sidecar carries a few extra pairs until
    * compact; `DeletionVectorsSpec` replays a whole stream and
    * asserts the view). */
  def start(updates: DataFrame, lakeDir: String, checkpointDir: String,
      keys: Seq[String], filesPerRewrite: Int = 4,
      indexDir: Option[String] = None,
      mor: Boolean = false,
      view: Option[ViewSpec] = None): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (mor)
          DeletionVectors.mergeMor(batch.sparkSession, lakeDir, batch,
            keys, evolveSchema = false, indexDir)
        else
          MergeInto.merge(batch.sparkSession, lakeDir, batch, keys,
            filesPerRewrite, evolveSchema = false, indexDir)
        // view maintenance AFTER the upsert publishes: the refresh
        // pins its own window, so a crash between the two leaves the
        // view one window behind — the next batch's refresh folds
        // both in (never split, never double-applied)
        view.foreach { v =>
          IncrementalView.refresh(batch.sparkSession, lakeDir,
            v.viewDir, v.groupCols, v.sumCols,
            minMaxCols = v.minMaxCols): Unit
        }
        ()
      }
      .start()
}
