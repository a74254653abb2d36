package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Context-window preparation for training pipelines: overlapping
  * fixed-size chunking of long documents, and next-fit packing of whole
  * documents into token-budget bins.
  */
object Packing {

  final case class PackDoc(id: Long, bucket: Int, n: Long)
  final case class PackAssign(id: Long, bucket: Int, bin: Long, n: Long)

  /** Split each document into token windows of `size` tokens every
    * `stride` tokens (overlapping when stride < size; the final window
    * may be short). Pure per-row explode — map-only at any scale, no
    * shuffle, and the window arithmetic is exact-integer so the DuckDB
    * oracle matches bit-for-bit. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int = 20, stride: Int = 10): DataFrame = {
    val w = split(col(textCol), " ")
    docs
      .select(col(idCol).as("id"), w.as("w"),
        org.apache.spark.sql.functions.size(w).cast("long").as("n"))
      .select(col("id"), col("w"), col("n"),
        explode(expr(s"sequence(1L, n, ${stride}L)")).as("s"))
      .select(col("id"),
        expr(s"(s - 1L) div ${stride}L").as("chunk_idx"),
        array_join(slice(col("w"), col("s").cast("int"), lit(size)), " ").as("chunk_text"),
        least(lit(size.toLong), col("n") - col("s") + lit(1L)).as("chunk_tokens"))
  }

  /** Next-fit packing: documents are routed to `buckets` independent
    * packers by id hash-slot, and each packer walks its documents in id
    * order, appending to the current bin until the token budget
    * `capacity` would overflow, then opening a new bin.
    *
    * Packing is inherently sequential, so the scale unit is the bucket:
    * each bucket's group is processed as one sorted stream
    * (`flatMapSortedGroups` — Spark sorts within the shuffle, the
    * iterator is never materialized, packer state is O(1)). At 100 TB
    * you raise `buckets` to ~the executor-slot count; determinism is
    * preserved because bucket assignment and intra-bucket order are
    * both pure functions of the id. */
  def nextFitPack(docs: DataFrame, idCol: String, textCol: String,
                  capacity: Long = 200L, buckets: Int = 32): Dataset[PackAssign] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        (col(idCol).cast("long") % buckets).cast("int").as("bucket"),
        size(split(col(textCol), " ")).cast("long").as("n"))
      .as[PackDoc]
      .groupByKey(_.bucket)
      .flatMapSortedGroups($"id") { (bucket: Int, it: Iterator[PackDoc]) =>
        var bin = -1L
        var acc = capacity + 1 // force a new bin on the first doc
        it.map { d =>
          if (acc + d.n > capacity) { bin += 1; acc = d.n }
          else acc += d.n
          PackAssign(d.id, bucket, bin, d.n)
        }
      }
  }
}
