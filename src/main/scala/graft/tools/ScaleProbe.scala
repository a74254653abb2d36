package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf0.1 corpus Nx with perturbed ids/content
  * and measure the LSH pipelines — validates near-linear scaling (no
  * band-bucket quadratic blowup) before trusting the 100 TB design. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(4)
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $n: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = graft.core.Tables.documents(spark, d)
    // replicate with distinct ids, tagging EVERY word per copy so copies
    // are genuinely not near-dups (a one-word prefix leaves Jaccard
    // ≈ (W-2)/(W-1) ≈ 0.98 between copies — every doc would gain mult-1
    // twins and pair output would be Ω(mult²) by construction; see
    // AdversarialProbe's corpus note)
    val big = (0 until mult).map { m =>
      docs.select((col("doc_id") + lit(m * 1000000L)).as("doc_id"),
        expr(s"array_join(transform(split(text, ' '), w -> concat(w, '$m')), ' ')")
          .as("text"))
    }.reduce(_ union _).cache()
    println("docs: " + big.count())
    time(s"minhash_lsh x$mult")(
      graft.llm.TextDedup.minhashLsh(big, "doc_id", "text", 0.8).count())
    time(s"simhash x$mult")(
      graft.llm.TextDedup.simhashPairs(big, "doc_id", "text", 3).count())
    time(s"ngram_jaccard x$mult")(
      graft.llm.TextDedup.ngramJaccardJoin(big, "doc_id", "text", 0.5).count())
    // universal-shingle corpus: every doc ends with the same 4 words, so
    // 3 shingles have df == corpus size. The unsplit direct verify would
    // build df^2 ≈ (60k·mult)^2 pair-rows from them; the df-capped split
    // (TextDedup.verifyJaccardSplit) must stay near the plain timing.
    time(s"ngram_jaccard hot-universal x$mult")(
      graft.llm.TextDedup.ngramJaccardJoin(
        big.select(col("doc_id"),
          concat(col("text"), lit(" omega tail marker words")).as("text")),
        "doc_id", "text", 0.5).count())
    time(s"dedup_clusters x$mult")(
      graft.llm.DedupPipeline.components(
        graft.llm.TextDedup.minhashLsh(big, "doc_id", "text", 0.9)).count())
    // round-4 pipeline ops: line dedup shuffles on line content (the
    // probe corpus keeps per-copy dup fraction constant, so pair/group
    // counts scale linearly); the LM joins doc bigrams against a
    // fixed-vocabulary model; packing shuffles once on the bucket key.
    time(s"line_dedup x$mult")(
      graft.llm.LineOps.dedupSpans(
        graft.llm.LineOps.toLines(big, "doc_id", "text", 8)).count())
    time(s"bigram_counts x$mult")(
      graft.llm.LangModel.bigramCounts(big, "doc_id", "text").count())
    time(s"lm_perplexity x$mult")(
      graft.llm.LangModel.perplexityExact(big, big, "doc_id", "text").count())
    time(s"bm25 x$mult")(
      graft.llm.Ranking.bm25PerTerm(big, "doc_id", "text",
        Seq("the", "and", "of"), topK = 10).count())
    time(s"fingerprint x$mult")( // noop write: count() would prune the fp column
      graft.llm.TextStats.fingerprint(big, "doc_id", "text")
        .write.mode("overwrite").format("noop").save())
    time(s"pipeline_e2e x$mult")(
      graft.llm.Pipeline.prepareCorpus(big, "doc_id", "text",
        graft.llm.Sampling.rateToHex(0.5)).count())
    val emb = graft.core.Tables.embeddings(spark, d)
    val bigEmb = (0 until mult).map { m =>
      emb.select((col("vec_id") + lit(m * 1000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ union _).cache()
    println("vecs: " + bigEmb.count())
    time(s"ann_lsh x$mult")(
      graft.llm.Embeddings.annLshKnn(bigEmb, (0L until 8L), "vec_id", "embedding", 64, 5).count())
    spark.stop()
  }
}
