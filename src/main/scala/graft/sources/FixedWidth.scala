package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width binary record source (reference:
  * `lib/input/FixedLengthInputFormat.java:47` + `FixedLengthRecordReader`,
  * and the 100-byte Tera format `EX/terasort/TeraInputFormat.java`).
  *
  * Implementation: `binaryFile` scan + a codegen'd slice explode. Each
  * input file is one row of the binaryFile source, sliced into
  * length-`recordLen` records with their global offsets. For 100 TB-scale
  * Tera files the production path is a custom splittable FileFormat
  * (record length divides the split size, so splits align); binaryFile is
  * the right-shaped stand-in that keeps the downstream schema identical.
  */
object FixedWidth {

  /** Read fixed-length records: (path, offset, record: binary). */
  def read(spark: SparkSession, path: String, recordLen: Int): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .select(col("path"),
        posexplode(expr(
          s"""transform(sequence(0, CAST(length(content) / $recordLen AS INT) - 1),
             |  i -> substring(content, i * $recordLen + 1, $recordLen))""".stripMargin)))
      .select(col("path"), (col("pos").cast("long") * recordLen).as("offset"),
        col("col").as("record"))

  /** Tera-format view of fixed 100-byte records: 10-byte key + 90-byte
    * value (`EX/terasort/TeraInputFormat.java`: KEY_LENGTH=10). */
  def readTera(spark: SparkSession, path: String): DataFrame =
    read(spark, path, 100)
      .select(col("offset"),
        substring(col("record"), 1, 10).as("key"),
        substring(col("record"), 11, 90).as("value"))
}
