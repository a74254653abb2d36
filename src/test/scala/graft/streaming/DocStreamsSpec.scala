package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables
import graft.llm.{Cleaning, Sampling}

case class DocEvent(doc_id: Long, text: String, ts: Timestamp)

class DocStreamsSpec extends SparkTestBase {

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("row-wise repetition stats are bit-identical to the batch shuffle version") {
    val docs = Tables.documents(spark, sf0001)
    val a = DocStreams.repetitionStatsRowwise(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val cols = Seq("id", "n_words", "n_distinct_words", "n_chars",
      "top_word_count", "dup_word_frac", "top_word_frac", "mean_word_len", "keep")
    val b = Cleaning.repetitionStats(docs, "doc_id", "text")
      .select(cols.map(col): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(a == b) // includes exact double equality on the three ratios
  }

  test("quality+sample filter over a MemoryStream matches the batch decision") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).limit(100)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    mem.addData(docs.map { case (id, t) => DocEvent(id, t, ts(0)) }.toSeq)
    val q = DocStreams.qualitySampled(mem.toDF(), "doc_id", "text",
      Sampling.rateToHex(0.5))
      .writeStream.format("memory").queryName("qs").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("qs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batch = {
      val d = Tables.documents(spark, sf0001).limit(100)
      val stats = Cleaning.repetitionStats(d, "doc_id", "text").filter(col("keep"))
      Sampling.hashSample(d.join(stats.select(col("id")),
          d("doc_id") === col("id"), "left_semi"),
        "doc_id", Sampling.rateToHex(0.5))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.size < 100)
  }

  test("streaming packing: bins continue across micro-batches, match batch result") {
    import spark.implicits._
    // two batches with ascending ids: arrival order == id order, so the
    // streaming fold must equal the batch next-fit over the union
    def mkDoc(id: Long, words: Int) =
      DocEvent(id, (1 to words).map(i => s"w$i").mkString(" "), ts(0))
    val batch1 = (0L until 20L).map(i => mkDoc(i, 60 + (i % 5).toInt * 30))
    val batch2 = (20L until 40L).map(i => mkDoc(i, 60 + (i % 5).toInt * 30))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = DocStreams.packStream(mem.toDF(), "doc_id", "text",
        capacity = 200L, buckets = 4)
      .writeStream.format("memory").queryName("pk").outputMode("append").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("pk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val all = (batch1 ++ batch2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val batch = graft.llm.Packing.nextFitPack(all, "doc_id", "text",
        capacity = 200L, buckets = 4)
      .collect().map(p => (p.id, p.bucket, p.bin, p.n)).toSet
    assert(streamed == batch)
    // state really carried over: batch-2 docs continue batch-1 bins, so
    // some batch-2 doc must share a bin with a batch-1 doc
    val byBin = streamed.groupBy(t => (t._2, t._3))
    assert(byBin.exists { case (_, ds) =>
      ds.exists(_._1 < 20) && ds.exists(_._1 >= 20) })
  }

  test("streaming exact dedup: first digest arrival passes, repeats drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = DocStreams.dedupWithinWatermark(mem.toDF(), "doc_id", "text",
      "ts", "10 minutes")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      mem.addData(DocEvent(1, "alpha beta", ts(0)), DocEvent(2, "gamma", ts(1)))
      q.processAllAvailable()
      // same content, later ids, inside the watermark horizon -> dropped
      mem.addData(DocEvent(3, "ALPHA BETA", ts(2)), DocEvent(4, "delta", ts(3)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dd").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L)) // 3 deduped (case-insensitive digest)
  }
}
