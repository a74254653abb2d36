package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** TeraGen / TeraSort / TeraValidate (reference:
  * `EX/terasort/TeraGen.java` — seeded skip-ahead PRNG, pure function of
  * the row index; `TeraSort.java` — sampled split points + trie
  * partitioner; `TeraValidate.java` — global order + checksum equality).
  *
  * Spark mapping: the trie/sampler machinery IS `repartitionByRange`
  * (reservoir sampling + range exchange); binary columns compare unsigned
  * bytewise like the reference's raw-byte comparators, so sorting the
  * 10-byte key column is bit-compatible with Gray-sort rules. Validation
  * runs distributed: per-partition (first, last, sorted?, count, crc-sum)
  * then a driver-side boundary check over numPartitions tiny rows.
  */
object TeraSuite {

  /** Deterministic 100-byte records: 10-byte binary key + 90-byte value,
    * both pure functions of the row index (TeraGen's contract). */
  def teraGen(spark: SparkSession, rows: Long, partitions: Int = 32): DataFrame =
    spark.range(0, rows, 1, partitions)
      .select(
        unhex(substring(md5(concat(lit("tera-"), col("id").cast("string"))), 1, 20))
          .as("key"),
        concat(
          lpad(col("id").cast("string"), 10, "0"),
          lit("0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcdef!!"))
          .cast("binary").as("value"))

  /** Total-order sort on the binary key: sample → range exchange → local
    * sort (`EX/Sort.java:57` + TotalOrderPartitioner, built-in). */
  def teraSort(df: DataFrame, partitions: Int = 32): DataFrame =
    df.repartitionByRange(partitions, col("key"))
      .sortWithinPartitions(col("key"))

  case class PartSummary(part: Int, count: Long, crcSum: Long, sorted: Boolean,
                         first: Array[Byte], last: Array[Byte])

  /** TeraValidate: checks (a) every partition is internally sorted,
    * (b) partition boundaries are globally ordered, and returns
    * (records, checksum) for comparison against the input's checksum —
    * the reference's invariant-based golden test. */
  def teraValidate(sorted: DataFrame): (Long, Long) = {
    import sorted.sparkSession.implicits._
    val comparator = java.util.Arrays.compareUnsigned(_: Array[Byte], _: Array[Byte])
    val summaries = sorted
      .select(col("key"), crc32(concat(col("key"), col("value"))).as("crc"))
      .mapPartitions { rows =>
        var part = org.apache.spark.TaskContext.getPartitionId()
        var count = 0L; var crcSum = 0L; var ok = true
        var first: Array[Byte] = null; var last: Array[Byte] = null
        rows.foreach { r =>
          val k = r.getAs[Array[Byte]](0)
          if (first == null) first = k
          if (last != null && comparator(last, k) > 0) ok = false
          last = k; count += 1; crcSum += r.getLong(1)
        }
        if (count == 0) Iterator.empty
        else Iterator(PartSummary(part, count, crcSum, ok, first, last))
      }
      .collect().sortBy(_.part)
    require(summaries.forall(_.sorted), "partition not internally sorted")
    summaries.sliding(2).foreach {
      case Array(a, b) =>
        require(comparator(a.last, b.first) <= 0,
          s"partition boundary out of order: ${a.part} -> ${b.part}")
      case _ =>
    }
    (summaries.map(_.count).sum, summaries.map(_.crcSum).sum)
  }

  /** Input-side checksum for the equality half of the validation. */
  def checksum(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(crc32(concat(col("key"), col("value")))))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }
}
