package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.PartitionedWrite

/** Exactly-once file output for at-least-once streams: each micro-batch
  * lands under its own `batch_id=<n>` partition via a dynamic partition
  * overwrite, so a REPLAYED batch (source rewind, crash between sink
  * write and checkpoint commit — the standard foreachBatch failure
  * window) rewrites its own directory with the same content instead of
  * appending duplicates. Output = f(batch), not f(delivery count).
  *
  * This is the streaming face of [[graft.ops.PartitionedWrite]] — the
  * same directory-swap transactionality, keyed by Structured Streaming's
  * monotonic batchId. The reference has no streaming surface at all
  * (SURVEY §2.11); its batch analog is re-running a job over the same
  * output directory, which FileOutputCommitter only makes safe for
  * whole-job overwrite — not per-increment.
  *
  * Scale notes: each batch writes only its own rows (delta-sized, no
  * read-modify-write of history); downstream consumers see an
  * append-only directory tree they can compact with
  * [[graft.ops.Compaction]] once batch directories go cold. For
  * event-time-partitioned layouts, swap `batch_id` for a
  * (event-bucket, batch_id) pair so late buckets still land
  * idempotently.
  */
object IdempotentSink {

  /** Write one micro-batch under `path/batch_id=<batchId>/`, replacing
    * any previous attempt for the SAME batchId, touching no other
    * batch's directory (IdempotentSinkSpec pins both). */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Unit =
    PartitionedWrite.overwritePartitions(
      batch.withColumn("batch_id", lit(batchId)), path, Seq("batch_id"))

  /** The streaming entry: foreachBatch → [[writeBatch]]. */
  def partitionedParquet(stream: DataFrame, path: String,
                         checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => writeBatch(b, path, id))
      .start()
}
