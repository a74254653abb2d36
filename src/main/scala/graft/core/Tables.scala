package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Mirrors the reference's "schema is fixed by configuration" model
  * (SURVEY.md §1.2: Hadoop jobs declare key/value classes on the JobConf,
  * `CORE/mapreduce/Job.java` ~:740-790) — here each table has a known
  * parquet schema and we simply read it. Filters and projections applied
  * downstream are pushed into the parquet scan by Catalyst, which strictly
  * subsumes the reference's scan-time record filters
  * (`lib/input/SequenceFileInputFilter.java:110,153,202`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[Sessions]] /
    * Verify / Bench). Normalize it back to a microsecond TIMESTAMP_NTZ so
    * downstream queries and the DuckDB oracle (which reads nanos natively)
    * agree — truncation to µs only matters within 1µs of a boundary. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
            .cast("timestamp_ntz"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
