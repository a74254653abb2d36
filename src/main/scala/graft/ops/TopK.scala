package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state per-group top-k (SURVEY.md §2.5 top-k, deepened for
  * scale; reference `EX/Grep.java:89-92` does global top via one sorted
  * reduce). The window-function formulation
  * (`row_number().over(partitionBy(key).orderBy(ord))` + filter) sorts
  * EVERY group in full before discarding all but k rows — at 100 TB a
  * hot key's group sort dominates the stage. This Aggregator keeps a
  * k-bounded sorted buffer per group with map-side partial merge
  * (ObjectHashAggregate), so state is O(k) per group per task and the
  * shuffle carries at most k rows per group per map task — the
  * per-group twin of what TakeOrderedAndProject does globally.
  */
object TopK {

  /** Sorted-descending capped buffer; (ord, tag) pairs, ties broken by
    * ascending tag for determinism. */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    private def insert(b: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] = {
      // descending ord, ascending tag on ties. Compare via
      // java.lang.Double.compare, NOT primitive >/==: a NaN ord (e.g.
      // cosine of a zero-norm vector) makes every primitive comparison
      // false, so its buffer position — and therefore which rows it
      // evicts — would depend on insertion/merge order across
      // partitions. Double.compare totals the order (NaN greatest,
      // matching how Spark's sort-based formulations rank it) and keeps
      // results partition-count-independent.
      val (front, back) = b.span { x =>
        val c = java.lang.Double.compare(x._1, v._1)
        c > 0 || (c == 0 && x._2 < v._2)
      }
      val merged = front ::: v :: back
      if (merged.length > k) merged.take(k) else merged
    }
    def zero: List[(Double, Long)] = Nil
    def reduce(b: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] =
      insert(b, v)
    def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      b.foldLeft(a)(insert)
    def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r
    def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** `cast("long")` on a non-numeric column yields nulls that only blow
    * up deep inside the aggregation ("Null value appeared in
    * non-nullable field") — fail at the API boundary instead. */
  private def requireNumeric(df: DataFrame, role: String, c: String): Unit = {
    val t = df.schema(c).dataType
    require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$role column '$c' must be numeric (long-codable) for the bounded " +
        s"top-k buffer, got ${t.simpleString}; map string ids to a " +
        "surrogate long (e.g. xxhash64) first")
  }

  /** Top-k rows per group: (key, ord desc, tag asc) → (key, tag, ord,
    * rank). `tagCol` is a long row identifier carried through the
    * bounded buffer (join back for wider payloads). */
  def topKPerGroup(df: DataFrame, keyCol: String, ordCol: String,
                   tagCol: String, k: Int): DataFrame = {
    requireNumeric(df, "key", keyCol); requireNumeric(df, "ord", ordCol)
    requireNumeric(df, "tag", tagCol)
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("long"), col(ordCol).cast("double"),
      col(tagCol).cast("long")).as[(Long, Double, Long)]
    val agg = new TopKAgg(k).toColumn
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((ord, tag), i) =>
          (key, tag, ord, i + 1)
        }
      }
      .toDF(keyCol, tagCol, ordCol, "rank")
  }

  /** [[topKPerGroup]] for STRING group keys (e.g. per-term posting
    * lists) — same bounded buffer, same (ord desc, tag asc) order. */
  def topKPerGroupStr(df: DataFrame, keyCol: String, ordCol: String,
                      tagCol: String, k: Int): DataFrame = {
    requireNumeric(df, "ord", ordCol); requireNumeric(df, "tag", tagCol)
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("string"), col(ordCol).cast("double"),
      col(tagCol).cast("long")).as[(String, Double, Long)]
    val agg = new TopKAgg(k).toColumn
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((ord, tag), i) =>
          (key, tag, ord, i + 1)
        }
      }
      .toDF(keyCol, tagCol, ordCol, "rank")
  }
}
