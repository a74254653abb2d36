package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the distributed BPE trainer ([[Bpe.trainMerges]]) bit-exactly to
  * a sequential reference implementation (the registry entries are
  * rows-only — a one-shot SQL oracle cannot replay an iterated argmax),
  * and proves the encode side lossless corpus-wide.
  */
class BpeSpec extends SparkTestBase {

  /** Textbook sequential BPE over a word-frequency map, same tie-break
    * as the distributed trainer: count desc, then (left, right) asc. */
  private def refTrain(wc: Map[String, Long], nMerges: Int,
                       minPair: Long = 2L): Seq[(String, String)] = {
    var table: Seq[(Vector[String], Long)] =
      wc.toSeq.map { case (w, c) => (w.map(_.toString).toVector :+ Bpe.EOW, c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= minPair =>
          merges += ((a, b))
          table = table.map { case (syms, c) =>
            (Bpe.applyMerge(syms, a, b).toVector, c)
          }
        case _ => done = true
      }
      round += 1
    }
    merges.result()
  }

  private def wordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }

  test("hybrid paths agree: local == distributed == sequential reference") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val texts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val want = refTrain(wordCounts(texts), nMerges = 30)
    // hybrid dispatch takes the local path (vocab ≪ maxLocalVocab) ...
    assert(Bpe.trainMerges(docs, "text", nMerges = 30) == want)
    // ... and forcing the distributed fallback learns the same list
    assert(Bpe.trainMerges(docs, "text", nMerges = 30, maxLocalVocab = 0L)
      == want)
  }

  test("tie-breaks are deterministic and partitioning-independent") {
    import spark.implicits._
    // 'ab' and 'cd' pair counts tie exactly; ('a','b') < ('c','d') must win
    val texts = Seq("ab ab cd cd", "ab cd", "ab cd xy")
    val want = refTrain(wordCounts(texts), nMerges = 8)
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.sparkContext.parallelize(texts, parts).toDF("text")
      // force the distributed loop — the path whose determinism depends
      // on partitioning; the local path collects and cannot vary
      assert(Bpe.trainMerges(df, "text", nMerges = 8, maxLocalVocab = 0L)
        == want, s"parts=$parts")
    }
  }

  test("encode is lossless over every distinct corpus word; tokens come from the learned vocab") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val merges = Bpe.trainMerges(docs, "text", nMerges = 30)
    val ranks = merges.zipWithIndex.toMap
    val vocab: Set[String] =
      merges.map { case (a, b) => a + b }.toSet ++ Set(Bpe.EOW)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val toks = Bpe.encodeWord(w, ranks)
      assert(Bpe.decodeTokens(toks) == w, s"roundtrip broke for '$w'")
      toks.foreach(t => assert(
        t.length == 1 || vocab.contains(t) ||
          (t.endsWith(Bpe.EOW) && (t == Bpe.EOW || vocab.contains(t))),
        s"token '$t' of '$w' is neither a single char nor a learned merge"))
    }
  }

  test("tokenFrequencies: mass conservation against whitespace tokens") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val merges = Bpe.trainMerges(docs, "text", nMerges = 20)
    val freq = Bpe.tokenFrequencies(docs, "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // every word contributes exactly one EOW-carrying token, so the
    // total EOW mass equals the corpus whitespace-token count
    val eowMass = freq.filter(_._1.endsWith(Bpe.EOW)).map(_._2).sum
    val nWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(eowMass == nWords)
    // and total character mass (EOW stripped) equals the corpus
    // non-space character mass — nothing lost, nothing invented
    val charMass = freq.map { case (t, n) => t.replace(Bpe.EOW, "").length * n }.sum
    val nChars = docs.select(
      sum(length(regexp_replace(col("text"), " ", ""))).as("c"))
      .collect()(0).getLong(0)
    assert(charMass == nChars)
  }

  test("encodeDocuments: per-doc decode losslessness + mass agreement with tokenFrequencies") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val merges = Bpe.trainMerges(docs, "text", nMerges = 20)
    val enc = Bpe.encodeDocuments(docs, "doc_id", "text", merges)
    val rows = enc.collect()
    // decode(encode(doc)) recovers the whitespace-normalized document
    val orig = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).mkString(" ")).toMap
    rows.foreach { r =>
      val got = Bpe.decodeTokens(r.getSeq[String](2))
      assert(got == orig(r.getLong(0)), s"doc ${r.getLong(0)} decode mismatch")
    }
    // n_tokens column is the tokens length, and total token mass equals
    // the corpus-level tokenFrequencies mass under the same merges
    assert(rows.forall(r => r.getLong(1) == r.getSeq[String](2).length))
    val perDocMass = rows.map(_.getLong(1)).sum
    val freqMass = Bpe.tokenFrequencies(docs, "text", merges)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(perDocMass == freqMass)
  }
}
