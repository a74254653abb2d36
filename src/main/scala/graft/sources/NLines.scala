package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.NLineInputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}

/** NLineInputFormat analog (reference: `lib/input/NLineInputFormat
  * .java:61,78` — N lines per split, key = byte offset of the line).
  * The use case is work-granularity control: each line is a heavy job
  * spec (a simulation parameter set, a crawl seed) and one task should
  * own exactly N of them regardless of byte sizes.
  *
  * Spark-first: the split computation is delegated to the SAME Hadoop
  * input format class (on Spark's classpath) via `newAPIHadoopFile`, so
  * split boundaries are bit-identical to the reference and each split
  * becomes one Spark partition — scale behavior included. */
object NLines {

  /** (offset, line) rows; each input partition holds ≤ n consecutive
    * lines of one file. */
  def read(spark: SparkSession, path: String, n: Int): DataFrame = {
    import spark.implicits._
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.setInt(NLineInputFormat.LINES_PER_MAP, n)
    spark.sparkContext
      .newAPIHadoopFile(path, classOf[NLineInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map { case (k, v) => (k.get(), v.toString) }
      .toDF("offset", "line")
  }
}
