package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** Contracts for [[TextDedup.incrementalMinhashLsh]] — the ingest-shaped
  * dedup: a new batch against a corpus's persisted band index.
  *   - EXACT equivalence to the batch run: incremental output over
  *     (corpus, batch) equals [[TextDedup.minhashLsh]] over the union
  *     minus its corpus-corpus pairs (per-doc signatures make batch-vs-
  *     index candidate generation lossless, and verify is exact Jaccard);
  *   - planted cross duplicates (a batch doc copying a corpus doc) are
  *     found through the index;
  *   - an empty batch yields an empty result without touching the corpus
  *     text.
  */
class IncrementalDedupSpec extends SparkTestBase {

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental == batch-run minus corpus-corpus pairs") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val index = TextDedup.minhashBandIndex(corpus, "doc_id", "text")
    val incr = pairSet(TextDedup.incrementalMinhashLsh(
      batch, corpus, index, "doc_id", "text", threshold = 0.8))
    val full = pairSet(TextDedup.minhashLsh(docs, "doc_id", "text",
      threshold = 0.8))
    val expected = full.filterNot { case (a, b, _) => a % 2 == 0 && b % 2 == 0 }
    assert(incr == expected,
      s"missing=${(expected -- incr).take(3)} extra=${(incr -- expected).take(3)}")
  }

  test("planted cross duplicate is found through the index") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 2 === 0).select($"doc_id", $"text")
    val copied = corpus.orderBy($"doc_id").limit(1)
      .select(($"doc_id" + 1000001L).as("doc_id"), $"text")
    val fresh = Seq((2000001L, "completely unrelated singleton words here"))
      .toDF("doc_id", "text")
    val batch = copied.union(fresh)
    val index = TextDedup.minhashBandIndex(corpus, "doc_id", "text")
    val out = TextDedup.incrementalMinhashLsh(
      batch, corpus, index, "doc_id", "text", threshold = 0.9)
    val copiedFrom = corpus.orderBy($"doc_id").first().getLong(0)
    val hit = out.filter($"id1" === copiedFrom && $"id2" === copiedFrom + 1000001L)
      .collect()
    assert(hit.length == 1 && hit(0).getDouble(2) == 1.0)
    assert(out.filter($"id1" === 2000001L || $"id2" === 2000001L).count() == 0)
  }

  test("band index parquet round-trip: disk-loaded index gives identical pairs") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val index = TextDedup.minhashBandIndex(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mhband").toString + "/bands"
    TextDedup.saveBandIndex(index, dir)
    val loaded = TextDedup.loadBandIndex(spark, dir)
    // the relation itself round-trips (partitionBy moves `band` to the
    // end and narrows it to int — compare as sets of values) ...
    def rel(df: DataFrame) = df.select(col("id"), col("band").cast("long"),
      col("bh")).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rel(loaded) == rel(index))
    // ... and so does the ingest result through it
    assert(pairSet(TextDedup.incrementalMinhashLsh(
        batch, corpus, loaded, "doc_id", "text", threshold = 0.8)) ==
      pairSet(TextDedup.incrementalMinhashLsh(
        batch, corpus, index, "doc_id", "text", threshold = 0.8)))
  }

  test("empty batch yields empty output") {
    val corpus = Tables.documents(spark, sf0001).filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(lit(false))
    val index = TextDedup.minhashBandIndex(corpus, "doc_id", "text")
    assert(TextDedup.incrementalMinhashLsh(
      batch, corpus, index, "doc_id", "text").count() == 0)
  }
}
