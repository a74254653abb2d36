package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BinaryPartitioner analog (reference: `lib/partition/BinaryPartitioner
  * .java:71,133` — route rows by a hash of the byte subarray
  * `bytes[left : right+1]`, Python-style negative offsets allowed).
  * The reference use: co-partition records whose keys embed a routing
  * prefix/suffix (e.g. first 4 bytes of a composite binary key) without
  * materializing a separate column.
  *
  * Spark-first: the slice is a Column expression, so the repartition is
  * an ordinary hash Exchange on it — co-location for a later
  * sortWithinPartitions/mapPartitions comes from Catalyst, not a custom
  * RDD partitioner. */
object BinaryPartition {

  /** `bytes[left : right+1]` with Python-style offsets (negative counts
    * from the end), as a Column over a binary column. Spark's substring
    * on binary is 1-based, so indices are shifted after normalization. */
  def sliceColumn(bin: Column, left: Int, right: Int): Column = {
    val len = length(bin)
    // (offset + len) % len — the reference's normalization for negatives
    val leftIdx = pmod(lit(left) + len, len)
    val rightIdx = pmod(lit(right) + len, len)
    bin.substr(leftIdx + 1, rightIdx - leftIdx + 1) // substring is 1-based
  }

  /** Repartition `df` so rows with an equal key-byte slice share a
    * partition. */
  def repartitionBySlice(df: DataFrame, binCol: String, left: Int, right: Int,
                         numPartitions: Int): DataFrame =
    df.repartition(numPartitions, sliceColumn(col(binCol), left, right))
}
