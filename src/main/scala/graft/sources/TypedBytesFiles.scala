package graft.sources

import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}

import org.apache.spark.sql.SparkSession

import graft.ops.TypedBytes

/** The streaming ecosystem's SequenceFile ↔ typed-bytes CLI bridges
  * (reference: `STR/DumpTypedBytes.java:58` dumps SequenceFile records as
  * typed-bytes on stdout; `STR/LoadTypedBytes.java` loads a typed-bytes
  * stream into a SequenceFile). Like the reference tools these are
  * single-stream CLIENT utilities — the stream end is a terminal/fifo, so
  * the driver pumps it; the cluster-scale path for the same data is the
  * parquet/SequenceFile sources themselves.
  */
object TypedBytesFiles {

  /** Dump a Text/LongWritable SequenceFile dir as typed-bytes
    * (STRING key, LONG value) pairs; returns the pair count.
    * `toLocalIterator` streams one partition at a time — the driver
    * never holds the dataset. */
  def dump(spark: SparkSession, seqPath: String, out: OutputStream): Long = {
    val dos = new DataOutputStream(out)
    var n = 0L
    val it = SequenceFiles.readTextLong(spark, seqPath).toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      TypedBytes.writePair(dos, (r.getString(0), r.getLong(1)))
      n += 1
    }
    dos.flush()
    n
  }

  /** Load a typed-bytes stream of (STRING, LONG) pairs into a
    * Text/LongWritable SequenceFile dir; returns the pair count. */
  def load(spark: SparkSession, in: InputStream, seqPath: String): Long = {
    import spark.implicits._
    val dis = new DataInputStream(in)
    val pairs = Iterator.continually(TypedBytes.readPairOpt(dis))
      .takeWhile(_.isDefined)
      .map { case Some((k, v)) => (k.asInstanceOf[String], v.asInstanceOf[Long])
             case None => throw new IllegalStateException("unreachable") }
      .toSeq
    SequenceFiles.writeTextLong(pairs.toDF("key", "value"), seqPath)
    pairs.size.toLong
  }
}
