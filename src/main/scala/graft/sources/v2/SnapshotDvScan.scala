package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Shared executor-side parquet row reader: Spark's own
  * `buildReaderWithPartitionValues` closure (broadcast hadoop conf
  * inside), row-returning mode, no pushed filters — so a file's rows
  * arrive complete and IN FILE ORDER, which is what both the streaming
  * source and the delete-vector scan rely on. */
private[v2] object V2ParquetRead {
  def rowReadFunc(spark: SparkSession,
                  schema: StructType): PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, schema, StructType(Nil), schema, Nil,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())

  def partitionedFile(file: String, length: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(file), 0L,
      length, Array.empty[String], 0L, length, Map.empty)
}

/** Batch scan over a delete-vector-bearing snapshot version: one
  * partition per data file carrying THAT file's deleted row positions
  * (collected driver-side — DVs are small by contract, folded away by
  * compaction), readers subtract them by counting file order against the
  * sorted position list. Trades pushdown for correctness on exactly the
  * versions that carry DVs — a compacted table goes back to the native
  * pushdown scan — which is how the SQL catalog serves merge-on-read
  * tables instead of refusing them. */
private[v2] class SnapshotDvScanBuilder(spark: SparkSession, schema: StructType,
                                        files: Seq[String], dvs: Seq[String])
  extends ScanBuilder {

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = schema
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      def norm(p: String): String = new Path(p).toUri.getPath
      val dvDf = spark.read.parquet(dvs: _*)
      // DVs are bounded small by contract (compaction folds them); the
      // guard turns a pathological vector into a clear instruction
      // instead of a driver OOM at collect time
      val n = dvDf.count()
      require(n <= 50L * 1000 * 1000,
        s"delete vectors hold $n entries — run Snapshots.commitCompaction " +
          "(CALL <cat>.system.optimize) to fold them before scanning")
      val deleted: Map[String, Array[Long]] =
        dvDf.collect()
          .groupBy(r => norm(r.getString(0)))
          .map { case (f, rows) => f -> rows.map(_.getLong(1)).sorted }
      val fs = new Path(files.head).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      files.map { f =>
        DvFilePartition(f, fs.getFileStatus(new Path(f)).getLen,
          deleted.getOrElse(norm(f), Array.empty)): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new DvPartitionReaderFactory(V2ParquetRead.rowReadFunc(spark, schema))
  }
}

private[v2] case class DvFilePartition(file: String, length: Long,
                                       deletedPositions: Array[Long])
  extends InputPartition

private[v2] class DvPartitionReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DvFilePartition]
    val it = readFunc(V2ParquetRead.partitionedFile(part.file, part.length))
    val dead = part.deletedPositions // sorted; row order == file order
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      private var pos = -1L
      private var di = 0
      override def next(): Boolean = {
        while (it.hasNext) {
          current = it.next(); pos += 1
          while (di < dead.length && dead(di) < pos) di += 1
          if (di >= dead.length || dead(di) != pos) return true
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
