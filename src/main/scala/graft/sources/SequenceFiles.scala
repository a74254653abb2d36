package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SequenceFile compatibility (reference: `IO/SequenceFile.java` as the
  * native KV container, `lib/input/SequenceFileInputFormat.java:41`,
  * `lib/output/SequenceFileOutputFormat.java:43`).
  *
  * Our native container is Parquet (columnar, predicate pushdown,
  * codegen'd scans — strictly better at 100 TB); these shims read/write
  * the reference's on-disk format for interop, via the same Hadoop
  * input/output formats Spark ships.
  */
object SequenceFiles {

  /** Write a (key: string, value: long) DataFrame as a Text/LongWritable
    * SequenceFile — the WordCount output format of the reference. */
  def writeTextLong(df: DataFrame, path: String): Unit =
    df.rdd
      .map(r => (new Text(r.getString(0)), new LongWritable(r.getLong(1))))
      .saveAsSequenceFile(path)

  /** BLOCK-compressed Text/LongWritable SequenceFile write
    * (`IO/SequenceFile.java:222` `CompressionType.BLOCK`): records
    * accumulate into key/value blocks compressed as units — the
    * reference's high-ratio mode, vs the default per-record framing of
    * [[writeTextLong]]. DefaultCodec (zlib) so no native libs needed;
    * the standard reader handles both framings transparently. */
  def writeTextLongBlock(df: DataFrame, path: String): Unit = {
    val conf = new org.apache.hadoop.mapred.JobConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    conf.setBoolean("mapreduce.output.fileoutputformat.compress", true)
    conf.set("mapreduce.output.fileoutputformat.compress.type", "BLOCK")
    conf.setClass("mapreduce.output.fileoutputformat.compress.codec",
      classOf[org.apache.hadoop.io.compress.DefaultCodec],
      classOf[org.apache.hadoop.io.compress.CompressionCodec])
    df.rdd
      .map(r => (new Text(r.getString(0)), new LongWritable(r.getLong(1))))
      .saveAsHadoopFile(path, classOf[Text], classOf[LongWritable],
        classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Text, LongWritable]],
        conf)
  }

  /** Read it back: (key, value) columns. */
  def readTextLong(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile[Text, LongWritable](path)
      .map { case (k, v) => (k.toString, v.get()) }
      .toDF("key", "value")
  }

  /** SequenceFileAsBinary mode (`lib/input/SequenceFileAsBinaryInputFormat
    * .java`, `lib/output/SequenceFileAsBinaryOutputFormat.java`): raw
    * BytesWritable KV — the payload is opaque application bytes, no
    * text/long interpretation. */
  def writeBinary(df: DataFrame, path: String): Unit =
    df.rdd
      .map(r => (new org.apache.hadoop.io.BytesWritable(r.getAs[Array[Byte]](0)),
        new org.apache.hadoop.io.BytesWritable(r.getAs[Array[Byte]](1))))
      .saveAsSequenceFile(path)

  /** Read raw-bytes SequenceFiles back as (key binary, value binary).
    * BytesWritable buffers are reused by the reader — copyBytes before
    * the rows escape the iterator. */
  def readBinary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile[org.apache.hadoop.io.BytesWritable,
        org.apache.hadoop.io.BytesWritable](path)
      .map { case (k, v) => (k.copyBytes(), v.copyBytes()) }
      .toDF("key", "value")
  }

  /** AutoInputFormat (`STR/AutoInputFormat.java`): sniff SequenceFile
    * ("SEQ" magic, `IO/SequenceFile.java` header) vs text per directory
    * and dispatch the right reader. Returns (key, value:string) rows. */
  def autoRead(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val firstFile = fs.listStatus(p).iterator
      .map(_.getPath).find(f => f.getName.startsWith("part") || f.getName.endsWith(".txt") || fs.getFileStatus(f).isFile)
      .getOrElse(p)
    val magic = new Array[Byte](3)
    val in = fs.open(firstFile)
    try in.readFully(0, magic) finally in.close()
    if (magic.sameElements("SEQ".getBytes))
      readTextLong(spark, path).selectExpr("key", "CAST(value AS STRING) AS value")
    else {
      import spark.implicits._
      spark.read.text(path).select(
        org.apache.spark.sql.functions.monotonically_increasing_id()
          .cast("string").as("key"),
        org.apache.spark.sql.functions.col("value"))
    }
  }
}
