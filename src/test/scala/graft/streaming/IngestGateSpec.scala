package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables
import graft.llm.{DedupPipeline, TextDedup}

/** The ingest gate's defining contract: whatever the batching, the
  * admitted corpus never contains a qualifying near-dup pair. Plus the
  * online mechanics: cross-dups of already-admitted docs are rejected
  * through the (growing) band index, novel docs pass, and within-batch
  * clusters admit exactly one representative. */
class IngestGateSpec extends SparkTestBase {

  private val threshold = 0.8

  private def docs = Tables.documents(spark, sf0001)

  /** Seed: the even half, offline-deduped so the starting corpus honors
    * the invariant the gate maintains. */
  private def seeded: IngestGate.GateState = IngestGate.init(
    DedupPipeline.cleanCorpus(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", threshold),
    "doc_id", "text")

  private def qualifyingPairs(corpus: DataFrame): Long =
    TextDedup.minhashLsh(corpus, "doc_id", "text", threshold).count()

  test("admitted corpus is near-dup-free under any batching of the stream") {
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val splits: Seq[Seq[DataFrame]] = Seq(
      Seq(odd),                                          // one batch
      Seq(odd.filter(col("doc_id") % 4 === 1),           // two batches
        odd.filter(col("doc_id") % 4 === 3)),
      Seq(odd.filter(col("doc_id") % 8 === 1),           // four batches
        odd.filter(col("doc_id") % 8 === 3),
        odd.filter(col("doc_id") % 8 === 5),
        odd.filter(col("doc_id") % 8 === 7)))
    for ((split, i) <- splits.zipWithIndex) {
      val (_, fin) = IngestGate.run(seeded, split, "doc_id", "text", threshold)
      assert(qualifyingPairs(fin.corpus) == 0L, s"split $i")
      // and the state is consistent: the index covers exactly the corpus
      assert(fin.index.select(col("id")).distinct().count() ==
        fin.corpus.count(), s"split $i index/corpus drift")
    }
  }

  test("cross-dup of an ADMITTED doc is rejected via the growing index; novel passes") {
    import spark.implicits._
    val novel = Seq((5000001L, "completely novel uncorrelated words alpha beta"))
      .toDF("doc_id", "text")
    val st0 = seeded
    val (adm1, st1) = IngestGate.step(st0, novel, "doc_id", "text", threshold)
    assert(adm1.count() == 1) // novel doc admitted
    // a later batch re-sends the same content under a new id: the copy
    // must be rejected through the index rows added for the admit
    val copy = Seq((5000002L, "completely novel uncorrelated words alpha beta"))
      .toDF("doc_id", "text")
    val (adm2, st2) = IngestGate.step(st1, copy, "doc_id", "text", threshold)
    assert(adm2.count() == 0)
    assert(st2.corpus.count() == st1.corpus.count())
  }

  test("within-batch cluster admits exactly its min-id representative") {
    import spark.implicits._
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "the quick brown fox jumps over the lazy dog tonight"),
      (12L, "the quick brown fox jumps over the lazy dog tonight"),
      (13L, "an entirely different document about winter mountain trails"))
      .toDF("doc_id", "text")
    val empty = IngestGate.init(batch.limit(0), "doc_id", "text")
    val (admitted, _) = IngestGate.step(empty, batch, "doc_id", "text", threshold)
    assert(admitted.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 13L))
  }
}
