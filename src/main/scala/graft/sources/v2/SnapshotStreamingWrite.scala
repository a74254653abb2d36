package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.ops.Snapshots

/** EXACTLY-ONCE Structured-Streaming write into a snapshot table — the
  * DSv2 route to what [[graft.streaming.SnapshotSink]] does via
  * foreachBatch, so `writeStream.toTable("snap.t")` (and
  * `.format(SnapshotStreamProvider)` with a `location` option) works
  * end-to-end with no user-side plumbing.
  *
  * The exactly-once argument is the SAME manifest ride as the sink's:
  * each epoch's files land under a fresh `data/stream-<query>-<epoch>`
  * directory, and `commit(epochId, …)` publishes them with a
  * `batch=<queryId>/<epochId>` marker as a manifest HEADER line — data
  * and marker become visible in one atomic rename. A replayed epoch
  * (crash between write and checkpoint, or a zombie attempt racing a
  * restarted driver) either sees the marker up front or loses the CAS
  * rename and sees it on re-read; both paths delete the duplicate files
  * and ack without publishing. The marker carries the QUERY id, so two
  * different streams appending to one table never mistake each other's
  * epoch numbers for replays.
  *
  * Data path: Spark's own parquet `OutputWriterFactory`
  * (`ParquetFileFormat.prepareWrite`, broadcast hadoop conf), one file
  * per non-empty task per epoch — a task that received no rows deletes
  * its file instead of publishing an empty part (the same
  * no-empty-artifacts rule as the no-op MoR commits). Only APPEND
  * output mode is supported: complete/update would need per-epoch
  * replace semantics this table format expresses as explicit
  * `commitReplace` calls instead.
  */
private[v2] class SnapshotStreamingWrite(spark: SparkSession, loc: String,
                                         schema: StructType, queryId: String)
  extends StreamingWrite {

  private val runDir = s"$loc/data/stream-$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // prepareWrite records the parquet write support + schema on the
    // JOB's configuration — that exact conf must reach the executors'
    // TaskAttemptContexts
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    SnapshotStreamingFactory(factory, schema, runDir,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case StreamFileMessage(Some(path)) => path
    }.toIndexedSeq
    val marker = s"batch=$queryId/$epochId"
    val published = Snapshots.publishAppend(spark, loc, files, Some(marker),
      schemaIfEmpty = Some(schema.json))
    if (published < 0 && files.nonEmpty) {
      // replayed epoch: this attempt's files are unreferenced garbage
      val fs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
      files.foreach(f => fs.delete(new Path(f), false))
    }
    // declared sidecar columns refresh per epoch (incremental: the
    // epoch's files only; best-effort, never fails the committed epoch)
    if (published >= 0) Snapshots.autoStats(spark, loc)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.foreach {
      case StreamFileMessage(Some(path)) => fs.delete(new Path(path), false)
      case _ => ()
    }
  }
}

private[v2] case class StreamFileMessage(path: Option[String])
  extends WriterCommitMessage

private[v2] case class SnapshotStreamingFactory(
    factory: OutputWriterFactory, schema: StructType, runDir: String,
    conf: SerializableConfiguration)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val ctx = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
        "graft-stream", epochId.toInt), TaskType.MAP, partitionId),
        (taskId % Int.MaxValue).toInt))
    val path = s"$runDir-$epochId/part-$epochId-$partitionId-" +
      s"${UUID.randomUUID()}${factory.getFileExtension(ctx)}"
    val writer = factory.newInstance(path, schema, ctx)
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(row: InternalRow): Unit = { writer.write(row); rows += 1 }
      override def commit(): WriterCommitMessage = {
        writer.close()
        if (rows == 0L) {
          // no empty parts in the manifest — delete rather than publish
          val p = new Path(path)
          p.getFileSystem(conf.value).delete(p, false)
          StreamFileMessage(None)
        } else StreamFileMessage(Some(path))
      }
      override def abort(): Unit = {
        writer.close()
        val p = new Path(path)
        p.getFileSystem(conf.value).delete(p, false)
      }
      override def close(): Unit = ()
    }
  }
}
