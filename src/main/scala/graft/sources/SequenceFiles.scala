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

  /** Read it back: (key, value) columns. */
  def readTextLong(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile[Text, LongWritable](path)
      .map { case (k, v) => (k.toString, v.get()) }
      .toDF("key", "value")
  }
}
