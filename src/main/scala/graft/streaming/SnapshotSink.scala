package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Snapshots

/** Exactly-once streaming APPEND into a [[graft.ops.Snapshots]] table —
  * the transaction-log idempotent-commit pattern (Delta-style
  * txn-version dedup), complementing [[IdempotentSink]]'s
  * partition-overwrite shape:
  *
  *  - [[IdempotentSink]] gives each batch its own directory; replay
  *    REWRITES it. Right when consumers want the raw per-batch layout.
  *  - this sink appends into one versioned TABLE; replay is recognized
  *    and SKIPPED. Right when consumers want snapshot reads, time
  *    travel, diff, compaction — the whole table lifecycle — over the
  *    stream's output.
  *
  * The exactly-once argument: the batch marker (`batch=<id>`) rides as
  * a header line INSIDE the manifest that publishes the batch's files,
  * so data and marker become visible in the SAME atomic rename. The
  * standard crash window (files written, checkpoint not committed →
  * source replays the batch) hits one of two states: the manifest
  * published — the marker is visible and the replay skips; or it did
  * not — the half-written data directory is unreferenced garbage and
  * the replay commits cleanly. No state where data is live twice.
  *
  * Zombie attempts (a dead driver's straggler racing its restarted
  * successor on the SAME batchId) are fenced too: the cheap pre-check
  * here is only an optimization — [[Snapshots.commitAppend]] re-checks
  * the marker set INSIDE its CAS publish loop, and the version claim
  * is a no-overwrite rename, so of two live attempts one lands and the
  * other loses the rename, re-reads, sees the marker, and aborts (-1).
  *
  * Scale notes: the marker check is a driver-side read of O(versions)
  * manifest HEADERS (markers never require reading a manifest's file
  * list) — nothing scans data; expire() forgets markers with their
  * versions, so retention must cover the source's maximum replay
  * horizon (checkpoint age), exactly the transaction-log retention
  * rule every table format documents.
  */
object SnapshotSink {

  /** Commit one micro-batch exactly once; returns the published version,
    * or -1 if `batchId` was already committed (replay detected — whether
    * before this call or by a concurrent attempt racing it). */
  def commitBatch(batch: DataFrame, loc: String, batchId: Long): Long = {
    val marker = s"batch=$batchId"
    if (Snapshots.markers(batch.sparkSession, loc).contains(marker)) -1L
    else Snapshots.commitAppend(batch, loc, Some(marker))
  }

  /** The streaming entry: foreachBatch → [[commitBatch]]. */
  def snapshotTable(stream: DataFrame, loc: String,
                    checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => { commitBatch(b, loc, id); () })
      .start()

  /** Exactly-once CO-CLUSTERED streaming ingest: each epoch appends
    * under the table's bucket layout ([[graft.ops.BucketLayout
    * .appendBucketed]] — the epoch marker rides in the same publishing
    * manifest), so a continuously streamed fact table keeps its
    * shuffle-free storage-partitioned join plan; fold the accumulated
    * per-epoch files with `CALL optimize_buckets` on a maintenance
    * timer. Requires the table bucket-laid before the stream starts. */
  def commitBatchBucketed(batch: DataFrame, loc: String, batchId: Long): Long = {
    val marker = s"batch=$batchId"
    if (Snapshots.markers(batch.sparkSession, loc).contains(marker)) -1L
    else graft.ops.BucketLayout.appendBucketed(
      batch.sparkSession, loc, batch, Some(marker))
  }

  def snapshotTableBucketed(stream: DataFrame, loc: String,
                            checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => { commitBatchBucketed(b, loc, id); () })
      .start()
}
