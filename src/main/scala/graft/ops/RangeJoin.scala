package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points against [lo, hi) intervals without a
  * broadcast-nested-loop product (SURVEY.md §2.4 "not present in
  * reference"; charter custom-operator list).
  *
  * Formulation: quantize the domain into `bucketWidth`-sized buckets;
  * each interval is replicated to every bucket it overlaps, each point
  * maps to exactly one bucket, and the join becomes an EQUI-join on the
  * bucket id plus an exact residual filter. Both sides shuffle-hash on
  * the bucket key — big-big capable, no O(|P|x|I|) product (a plain
  * `p >= lo AND p < hi` condition forces BroadcastNestedLoopJoin).
  * Cost scales with interval span / bucketWidth: pick bucketWidth near
  * the median interval length so replication stays O(1) per interval.
  */
object RangeJoin {

  /** Join `points` (containing `pointCol`) with `intervals` (containing
    * `loCol`, `hiCol`); emits matched (point row ++ interval row) pairs
    * for `lo <= point < hi`. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("_b", floor(col(pointCol) / bucketWidth))
    val i = intervals
      .withColumn("_b", explode(sequence(
        floor(col(loCol) / bucketWidth),
        // hi is exclusive: a bucket is touched only if lo < hi
        floor((col(hiCol) - 1) / bucketWidth))))
    p.join(i, Seq("_b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_b")
  }
}
