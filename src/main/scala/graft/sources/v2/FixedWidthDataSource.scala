package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Splittable fixed-width binary record source — DataSource V2.
  *
  * Reference: `lib/input/FixedLengthInputFormat.java:47` +
  * `FixedLengthRecordReader.java` (splits aligned to the record length)
  * and the 100-byte Tera format (`EX/terasort/TeraInputFormat.java`).
  *
  * This is the 100 TB path that `binaryFile` (whole-file rows,
  * unsplittable) cannot provide: each file is carved into independent
  * byte-range partitions ON record boundaries, so a 1 TB file becomes
  * ~8000 parallel 128 MB scans exactly like the reference's
  * `FileInputFormat.getSplits` (`lib/input/FileInputFormat.java:380`).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.v2.FixedWidthDataSource")
  *     .option("recordLen", "100")
  *     .option("maxSplitBytes", 128L * 1024 * 1024)   // optional
  *     .load(path)   // => (path string, offset long, record binary)
  * }}}
  */
class FixedWidthDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidthDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FixedWidthTable(new CaseInsensitiveStringMap(properties))
}

object FixedWidthDataSource {
  val schema: StructType = new StructType()
    .add("path", StringType).add("offset", LongType).add("record", BinaryType)
}

final class FixedWidthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"fixedwidth(${options.get("path")})"
  override def schema(): StructType = FixedWidthDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new FixedWidthScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class FixedWidthScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  private val recordLen = options.getInt("recordLen", -1)
  require(recordLen > 0, "recordLen option is required and positive")
  private val maxSplitBytes = options.getLong("maxSplitBytes", 128L * 1024 * 1024)
  private val paths: Seq[String] =
    Option(options.get("path")).orElse(Option(options.get("paths"))).toSeq
      .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))

  override def build(): Scan = this
  override def readSchema(): StructType = FixedWidthDataSource.schema
  override def toBatch: Batch = this

  /** Reference `FileInputFormat.getSplits` shape: enumerate files, carve
    * record-aligned byte ranges of at most maxSplitBytes. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    // round the target split DOWN to a whole number of records
    val recsPerSplit = math.max(maxSplitBytes / recordLen, 1L)
    val splitBytes = recsPerSplit * recordLen
    paths.flatMap { p =>
      val fsPath = new Path(p)
      val fs = fsPath.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(fsPath).isDirectory)
          fs.listStatus(fsPath).toSeq.filter(_.isFile).map(_.getPath)
        else Seq(fsPath)
      files.flatMap { f =>
        val len = fs.getFileStatus(f).getLen
        val usable = (len / recordLen) * recordLen // ignore a ragged tail
        (0L until usable by splitBytes).map { start =>
          FixedWidthPartition(f.toString, start,
            math.min(splitBytes, usable - start), recordLen)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory
}

/** Fixed-width writer (TeraOutputFormat analog,
  * `EX/terasort/TeraOutputFormat.java`): concatenates the binary columns
  * of each row into exactly `recordLen` bytes per record, one part file
  * per task — sorted input partitions therefore produce concatenable
  * sorted part files (the Gray-sort output contract). Not a full DSv2
  * SupportsWrite (commit protocol) — it reuses Spark's committer via
  * foreachPartition-free RDD saveAsHadoopFile-style direct writes kept
  * deliberately simple for the format's single use. */
object FixedWidthWriter {
  def write(df: org.apache.spark.sql.DataFrame, path: String, recordLen: Int): Unit = {
    val cols = df.columns
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val conf = new Configuration()
      val part = new Path(path, f"part-$pid%05d.bin")
      val fs = part.getFileSystem(conf)
      val out = fs.create(part, true)
      var n = 0L
      rows.foreach { r =>
        var written = 0
        var i = 0
        while (i < cols.length) {
          val b = r.getBinary(i)
          out.write(b); written += b.length; i += 1
        }
        require(written == recordLen,
          s"row wrote $written bytes, expected $recordLen")
        n += 1
      }
      out.close()
      Iterator.single(n)
    }.count(): Unit
  }
}

final case class FixedWidthPartition(path: String, start: Long, length: Long,
                                     recordLen: Int) extends InputPartition

final class FixedWidthReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FixedWidthReader(partition.asInstanceOf[FixedWidthPartition])
}

final class FixedWidthReader(p: FixedWidthPartition)
    extends PartitionReader[InternalRow] {
  private val fs = new Path(p.path).getFileSystem(new Configuration())
  private val in = fs.open(new Path(p.path))
  in.seek(p.start)
  private val pathUtf8 = UTF8String.fromString(p.path)
  private var pos = 0L
  private val buf = new Array[Byte](p.recordLen)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (pos >= p.length) false
    else {
      in.readFully(buf)
      current = InternalRow(pathUtf8, p.start + pos, buf.clone())
      pos += p.recordLen
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
