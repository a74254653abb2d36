package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** StreamXmlRecordReader analog (`STR/StreamInputFormat.java`,
  * `StreamXmlRecordReader.java:301`): records delimited by begin/end XML
  * tags. Implemented as `read.text` with the end tag as the line
  * separator (splittable at tag boundaries) + a regex body extract —
  * scan and extraction both codegen'd. */
object XmlRecords {

  /** One row per `<tag>...</tag>` block: (record = inner body). */
  def read(spark: SparkSession, path: String, tag: String): DataFrame =
    spark.read.option("lineSep", s"</$tag>").text(path)
      .select(regexp_extract(col("value"),
        s"(?s)<$tag(?:\\s[^>]*)?>(.*)", 1).as("record"))
      .filter(col("record") =!= "")
}
