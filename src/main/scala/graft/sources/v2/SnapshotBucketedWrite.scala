package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.ops.{BucketLayout, Snapshots}

/** SQL `INSERT INTO` / `INSERT OVERWRITE` that KEEPS the table's bucket
  * layout — the DSv2-native route ([[RequiresDistributionAndOrdering]])
  * to what [[graft.ops.BucketLayout.appendBucketed]] does through the
  * Scala API, closing the last gap between "SPJ exists" and "a SQL-only
  * pipeline keeps it": without this, a plain INSERT writes unrouted
  * files and the layout header (honestly, correctly) drops — the very
  * first ingest costs the zero-Exchange join plan.
  *
  * The write declares to Spark exactly the distribution the layout was
  * built with — `clustered(bucket(n, keys…))`, resolved against this
  * catalog's own [[BucketFunction]], so the INSERT's plan shuffles the
  * incoming batch ONCE by the layout's own hash recipe (O(batch), never
  * O(table)) — and asks for rows sorted by (bucket, keys…) within each
  * task. Each writer then ROLLS a fresh parquet file whenever the
  * incoming bucket id changes, landing every file under its
  * `__graft_bucket=<k>/` path segment: one file per (bucket, task-run),
  * normally one per non-empty bucket. Commit publishes through the same
  * `routedLayout` contract as `appendBucketed` — the layout header
  * carries only if the table STILL has exactly the spec this batch was
  * hashed with (a concurrent re-bucket drops the carry rather than
  * corrupting co-partitioned plans).
  *
  * Reference analog: the whole point of `CompositeInputFormat`
  * (CORE/…/lib/join/CompositeInputFormat.java:56) was that inputs STAY
  * co-partitioned across jobs — here an ingest job keeps them
  * co-partitioned with zero API detour.
  */
private[v2] class SnapshotBucketedWrite(spark: SparkSession, loc: String,
                                        schema: StructType,
                                        spec: BucketLayout.Spec,
                                        publish: Seq[String] => Long,
                                        queryId: String = "")
  extends Write with RequiresDistributionAndOrdering {

  private val dataDir = s"$loc/data/${UUID.randomUUID()}"

  override def description(): String =
    s"snapshot-bucketed-commit $dataDir (${BucketLayout.format(spec)})"

  private def transforms =
    spec.columns.zip(spec.counts).map { case (c, n) =>
      Expressions.bucket(n, c)
    }

  override def requiredDistribution(): Distribution =
    Distributions.clustered(transforms.map(t =>
      t: org.apache.spark.sql.connector.expressions.Expression).toArray)

  /** Pin the routing Exchange's partition count: without this it runs
    * at `spark.sql.shuffle.partitions` and AQE COALESCES the small
    * post-shuffle partitions — merging several buckets into one serial
    * writer task (measured 1.7x on the 24M-row ingest probe vs the API
    * path's exact routing). At exactly `buckets` partitions, bucket ids
    * still HASH-COLLIDE into tasks (~1/e slots idle, some tasks writing
    * 2-3 buckets serially — measured 1.25x vs the API append at n =
    * cores, the sharpest case); OVER-PROVISIONING 4x spreads distinct
    * bucket vectors across mostly-distinct tasks (expected collisions
    * n/8), cutting the makespan tail to ~1.05x while each bucket still
    * lands whole in ONE task (= one file). Empty partitions schedule
    * no-op tasks — noise next to a serialized bucket write. Collisions
    * only matter while the routed write fits in a few task WAVES
    * (tasks ≈ cores — one straggling 2-bucket task extends the
    * makespan); many waves amortize them, so the over-provision
    * threshold scales with the cluster: up to 8 waves of cores (floor
    * 1024 so small layouts behave identically everywhere), beyond that
    * 1:1 — a 4096-bucket layout over-provisions on the 4000-core
    * cluster where its ingest IS one wave, and stays 1:1 on the 32-core
    * box where 128 waves already amortize. */
  override def requiredNumPartitions(): Int = {
    val cores = spark.sparkContext.defaultParallelism
    if (spec.buckets <= math.max(1024, 8 * cores))
      math.min(spec.buckets * 4, 65536)
    else spec.buckets
  }

  /** (bucket vector, keys…) ascending: the clustered distribution alone
    * lets a task receive several bucket vectors (they hash into tasks);
    * the sort groups them contiguously so the writer holds ONE open
    * file at a time, and keys within each file stay ordered for tight
    * row-group stats — same contract as the maintenance rewrite's
    * files. */
  override def requiredOrdering(): Array[SortOrder] =
    (transforms.map(t => Expressions.sort(t, SortDirection.ASCENDING)) ++
      spec.columns.map(c =>
        Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)))
      .toArray

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DataWriterFactory = {
      val job = Job.getInstance(spark.sessionState.newHadoopConf())
      val factory = new ParquetFileFormat()
        .prepareWrite(spark, job, Map.empty, schema)
      BucketRoutingFactory(factory, schema, dataDir,
        spec.columns.map(schema.fieldIndex).toArray,
        spec.columns.map(c => schema(c).dataType).toArray,
        spec.counts.toArray,
        new SerializableConfiguration(job.getConfiguration))
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.toSeq.flatMap {
        case BucketFilesMessage(fs) => fs
        case _ => Nil
      }
      try publish(files)
      catch {
        case e: Throwable =>
          val dir = new Path(dataDir)
          dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(dir, true)
          throw e
      }
      Snapshots.autoStats(spark, loc)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val dir = new Path(dataDir)
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(dir, true)
    }
  }

  /** `writeStream.toTable` on a bucket-laid table: each epoch lands
    * ROUTED and publishes with both the exactly-once epoch marker and
    * the `routedLayout` carry — a continuously streamed fact keeps its
    * zero-Exchange join plan through the pure-SQL/DSv2 surface, same
    * contract as [[graft.streaming.SnapshotSink.snapshotTableBucketed]].
    * The required distribution/ordering apply to the micro-batch plan
    * exactly as to a batch INSERT (the toTable relation carries this
    * catalog, so the bucket transform resolves). */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      private val runDir = s"$loc/data/stream-$queryId"

      override def createStreamingWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
        val job = Job.getInstance(spark.sessionState.newHadoopConf())
        val factory = new ParquetFileFormat()
          .prepareWrite(spark, job, Map.empty, schema)
        BucketRoutingStreamingFactory(factory, schema, runDir,
          spec.columns.map(schema.fieldIndex).toArray,
          spec.columns.map(c => schema(c).dataType).toArray,
          spec.counts.toArray,
          new SerializableConfiguration(job.getConfiguration))
      }

      override def commit(epochId: Long,
                          messages: Array[WriterCommitMessage]): Unit = {
        val files = messages.toSeq.flatMap {
          case BucketFilesMessage(fs) => fs
          case _ => Nil
        }
        val marker = s"batch=$queryId/$epochId"
        val published = Snapshots.publishAppend(spark, loc, files,
          Some(marker), schemaIfEmpty = Some(schema.json),
          routedLayout = Some(BucketLayout.format(spec)))
        if (published < 0 && files.nonEmpty) {
          // replayed epoch: this attempt's files are unreferenced garbage
          val fs = new Path(loc).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          files.foreach(f => fs.delete(new Path(f), false))
        }
        if (published >= 0) Snapshots.autoStats(spark, loc)
      }

      override def abort(epochId: Long,
                         messages: Array[WriterCommitMessage]): Unit = {
        val fs = new Path(loc).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        messages.foreach {
          case BucketFilesMessage(fls) =>
            fls.foreach(f => fs.delete(new Path(f), false))
          case _ => ()
        }
      }
    }
}

/** Streaming adapter over [[BucketRoutingFactory]]: epoch e writes under
  * `<runDir>-<e>/__graft_bucket=…` so a replayed epoch's garbage is
  * identifiable and the abort path never touches a committed epoch. */
private[v2] case class BucketRoutingStreamingFactory(
    factory: OutputWriterFactory, schema: StructType, runDir: String,
    keyOrds: Array[Int], keyDts: Array[DataType], counts: Array[Int],
    conf: SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    BucketRoutingFactory(factory, schema, s"$runDir-$epochId",
      keyOrds, keyDts, counts, conf).createWriter(partitionId, taskId)
}

private[v2] case class BucketFilesMessage(files: Seq[String])
  extends WriterCommitMessage

/** Bucket-ROUTING parquet writer: computes each row's per-column bucket
  * ids with the interpreted Murmur3 (lockstep with `functions.hash` /
  * [[BucketFunction]]), composes the mixed-radix linear id, and writes
  * the row under `__graft_bucket=<linear>/`, rolling to a fresh file
  * whenever the bucket changes. Input arrives (buckets, keys…)-sorted,
  * so exactly one file stays open; an unsorted row stream (never
  * produced by the required ordering, but handled defensively) just
  * rolls extra files for the same bucket — more files, never wrong
  * routing. Opens lazily: an empty task writes nothing. */
private[v2] case class BucketRoutingFactory(
    factory: OutputWriterFactory, schema: StructType, dataDir: String,
    keyOrds: Array[Int], keyDts: Array[DataType], counts: Array[Int],
    conf: SerializableConfiguration)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] = {
    val ctx = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
        "graft-bucketed", 0), TaskType.MAP, partitionId),
        (taskId % Int.MaxValue).toInt))
    val ext = factory.getFileExtension(ctx)

    new DataWriter[InternalRow] {
      private var current: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var currentBucket = -1
      private var currentPath: String = _
      private var currentRows = 0L
      private var seq = 0
      private val done = scala.collection.mutable.ArrayBuffer.empty[String]

      // per-column hash, seed 42 each (NULL → the bare seed), composed
      // mixed-radix — identical to BucketLayout.linearId. SPECIALIZED
      // per type at writer construction: the generic
      // Murmur3HashFunction.hash(Any, …) boxes every key of every row
      // (24M-row batches made it visible on the ingest probe); each
      // closure below is the primitive catalyst arm.
      private val hashers: Array[InternalRow => Int] = {
        import org.apache.spark.unsafe.hash.Murmur3_x86_32
        import org.apache.spark.sql.types._
        keyDts.zipWithIndex.map { case (dt, i) =>
          val ord = keyOrds(i)
          dt match {
            case _: LongType => (r: InternalRow) =>
              if (r.isNullAt(ord)) 42
              else Murmur3_x86_32.hashLong(r.getLong(ord), 42)
            case _: IntegerType | _: DateType => (r: InternalRow) =>
              if (r.isNullAt(ord)) 42
              else Murmur3_x86_32.hashInt(r.getInt(ord), 42)
            case _: ShortType => (r: InternalRow) =>
              if (r.isNullAt(ord)) 42
              else Murmur3_x86_32.hashInt(r.getShort(ord).toInt, 42)
            case _: ByteType => (r: InternalRow) =>
              if (r.isNullAt(ord)) 42
              else Murmur3_x86_32.hashInt(r.getByte(ord).toInt, 42)
            case _: BooleanType => (r: InternalRow) =>
              if (r.isNullAt(ord)) 42
              else Murmur3_x86_32.hashInt(if (r.getBoolean(ord)) 1 else 0, 42)
            case _: StringType => (r: InternalRow) =>
              if (r.isNullAt(ord)) 42
              else {
                val u = r.getUTF8String(ord)
                Murmur3_x86_32.hashUnsafeBytes(
                  u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
              }
            case other => (r: InternalRow) => // contract twin fallback
              if (r.isNullAt(ord)) 42
              else Murmur3HashFunction.hash(r.get(ord, other), other, 42L).toInt
          }
        }
      }

      private def bucketOf(row: InternalRow): Int = {
        var linear = 0
        var i = 0
        while (i < hashers.length) {
          linear = linear * counts(i) +
            java.lang.Math.floorMod(hashers(i)(row), counts(i))
          i += 1
        }
        linear
      }

      private def roll(bucket: Int): Unit = {
        closeCurrent()
        currentPath = s"$dataDir/__graft_bucket=$bucket/" +
          s"part-$partitionId-$seq-${UUID.randomUUID()}$ext"
        seq += 1
        current = factory.newInstance(currentPath, schema, ctx)
        currentBucket = bucket
        currentRows = 0L
      }

      private def closeCurrent(): Unit = if (current != null) {
        current.close()
        if (currentRows > 0) done += currentPath
        else { // no empty parts in the manifest
          val p = new Path(currentPath)
          p.getFileSystem(conf.value).delete(p, false)
        }
        current = null
      }

      override def write(row: InternalRow): Unit = {
        val b = bucketOf(row)
        if (b != currentBucket || current == null) roll(b)
        current.write(row)
        currentRows += 1
      }

      override def commit(): WriterCommitMessage = {
        closeCurrent()
        BucketFilesMessage(done.toSeq)
      }

      override def abort(): Unit = {
        if (current != null) { current.close(); current = null }
        val fs = new Path(dataDir).getFileSystem(conf.value)
        (done.toSeq ++ Option(currentPath)).foreach(f =>
          fs.delete(new Path(f), false))
      }

      override def close(): Unit = ()
    }
  }
}
