package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (reference: `lib/db/DBInputFormat.java:61`,
  * `DataDrivenDBInputFormat.java:61` — SQL scans split by LIMIT/OFFSET or
  * min/max ranges over a split column via per-type splitters; sink:
  * `lib/db/DBOutputFormat.java:50` batched INSERTs).
  *
  * Spark's `read.jdbc(partitionColumn, lb, ub, numPartitions)` IS the
  * DataDrivenDBInputFormat design (numeric/date range splitting built
  * in); `write.jdbc` batches INSERTs per partition. These wrappers pin
  * the engine's defaults (fetchsize, batchsize) so behavior is uniform
  * across vendors.
  */
object Jdbc {

  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      props: Properties = new Properties()): DataFrame = {
    props.setProperty("fetchsize", "1000")
    spark.read.jdbc(url, table, partitionColumn,
      lowerBound, upperBound, numPartitions, props)
  }

  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite,
            props: Properties = new Properties()): Unit = {
    props.setProperty("batchsize", "1000")
    df.write.mode(mode).jdbc(url, table, props)
  }
}
