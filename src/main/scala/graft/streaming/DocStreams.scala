package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Sampling

/** Streaming ingest for the training-data pipeline: the cleaning /
  * sampling / dedup kernels re-expressed so they run under Structured
  * Streaming. The batch versions in `graft.llm` shuffle (per-(doc,word)
  * aggregation, digest group-by); a stream can't wait for a corpus-wide
  * shuffle, so here:
  *
  * - quality stats are computed ROW-WISE with array expressions (per-doc
  *   work is bounded by document length, state is zero — legal in any
  *   output mode, fused into whole-stage codegen);
  * - sampling is the same salted-hash filter as batch (already
  *   stateless — determinism means a doc's fate is decided by its id,
  *   not by when it arrives);
  * - exact dedup holds only a watermark-bounded window of content
  *   digests (`dropDuplicatesWithinWatermark`): bounded state in
  *   exchange for dedup being exact only within the lateness horizon —
  *   the corpus-global pass stays a batch job, the stream filters the
  *   firehose in front of it.
  */
object DocStreams {

  /** [[graft.llm.Cleaning.repetitionStats]] computed without the
    * per-(doc,word) shuffle: top-word count via array ops on the row.
    * Per-row cost O(distinct_words * words); identical output columns,
    * identical values (asserted in DocStreamsSpec), stream-legal. */
  def repetitionStatsRowwise(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    docs
      .select(col(idCol).as("id"), w.as("w"),
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("n_distinct_words"),
        length(col(textCol)).cast("long").as("n_chars"))
      .withColumn("top_word_count",
        expr("array_max(transform(array_distinct(w), x -> size(filter(w, y -> y = x))))")
          .cast("long"))
      .drop("w")
      .withColumn("dup_word_frac",
        (col("n_words") - col("n_distinct_words")).cast("double")
          / col("n_words").cast("double"))
      .withColumn("top_word_frac",
        col("top_word_count").cast("double") / col("n_words").cast("double"))
      .withColumn("mean_word_len",
        (col("n_chars") - (col("n_words") - lit(1L))).cast("double")
          / col("n_words").cast("double"))
      .withColumn("keep",
        col("dup_word_frac") <= lit(0.3) && col("top_word_frac") <= lit(0.2)
          && col("mean_word_len") >= lit(3.0) && col("mean_word_len") <= lit(10.0))
  }

  /** Quality-filter + deterministic-sample a document stream: keep rows
    * inside the Gopher band whose salted hash clears `sampleHex`. One
    * row-local predicate (no join — a semi-join against derived stats
    * would be an illegal stream-stream join); no state, no watermark,
    * any output mode. Original columns pass through untouched. */
  def qualitySampled(docs: DataFrame, idCol: String, textCol: String,
                     sampleHex: String): DataFrame = {
    val w = split(col(textCol), " ")
    val nWords = size(w).cast("long")
    val dupFrac = ((nWords - size(array_distinct(w)).cast("long")).cast("double")
      / nWords.cast("double"))
    val topFrac = (expr(
      s"array_max(transform(array_distinct(split($textCol, ' ')), " +
        s"x -> size(filter(split($textCol, ' '), y -> y = x))))")
      .cast("long").cast("double")
      / nWords.cast("double"))
    val meanLen = ((length(col(textCol)).cast("long") - (nWords - lit(1L))).cast("double")
      / nWords.cast("double"))
    docs.filter(
      dupFrac <= lit(0.3) && topFrac <= lit(0.2)
        && meanLen >= lit(3.0) && meanLen <= lit(10.0)
        && Sampling.sampleKey(col(idCol), "graft") < lit(sampleHex))
  }

  /** Per-bucket packer state carried across micro-batches. */
  final case class PackState(bin: Long, acc: Long)

  /** Streaming next-fit sequence packing: documents are routed to
    * buckets by id (same rule as the batch [[graft.llm.Packing]]), and
    * each bucket's packer — one (bin, acc) pair — lives in
    * `flatMapGroupsWithState`, so bins keep filling across micro-batches
    * instead of restarting per batch. Docs are packed in id order WITHIN
    * a batch (sorted before folding); across batches, arrival order
    * rules — a streaming packer cannot wait for stragglers. State per
    * bucket is O(1), the canonical bounded-state contract. */
  def packStream(docs: DataFrame, idCol: String, textCol: String,
                 capacity: Long = 200L, buckets: Int = 32)
      : org.apache.spark.sql.Dataset[graft.llm.Packing.PackAssign] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.llm.Packing.{PackAssign, PackDoc}
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        (col(idCol).cast("long") % buckets).cast("int").as("bucket"),
        size(split(col(textCol), " ")).cast("long").as("n"))
      .as[PackDoc]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[PackState, PackAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket, it, state) =>
          var (bin, acc) = state.getOption
            .map(st => (st.bin, st.acc))
            .getOrElse((-1L, capacity + 1)) // force a new bin on first doc
          val out = it.toArray.sortBy(_.id).map { d =>
            if (acc + d.n > capacity) { bin += 1; acc = d.n }
            else acc += d.n
            PackAssign(d.id, bucket, bin, d.n)
          }
          state.update(PackState(bin, acc))
          out.iterator
      }
  }

  /** Exact-content dedup over a stream: first arrival of each digest
    * passes, repeats within the watermark horizon are dropped, state is
    * evicted once the event-time watermark passes. `tsCol` must be the
    * event-time column the watermark is defined on. */
  def dedupWithinWatermark(docs: DataFrame, idCol: String, textCol: String,
                           tsCol: String, delay: String): DataFrame =
    docs
      .withColumn("digest", md5(lower(col(textCol))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("digest")
}
