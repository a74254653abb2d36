package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranking over the documents table (Robertson & Zaragoza 2009,
  * "The Probabilistic Relevance Framework: BM25 and Beyond" — public
  * paper). Extends the tf-idf surface (`tfidf_top`) with document-length
  * normalization.
  *
  * Shape at scale: the posting list (doc, term, tf) is built sparse —
  * rows with tf = 0 never materialize — and both corpus scalars
  * (n_docs, avgdl) and per-term document frequencies ride back in as
  * broadcast joins, so the corpus is scanned once and shuffled zero
  * times; the per-term top-k is a bounded aggregation
  * ([[graft.ops.TopK]]), not a posting-list window sort.
  *
  * Cross-engine note: `bm25` (the full score) multiplies by
  * idf = ln((N - df + 0.5) / (df + 0.5) + 1). ln is the one step that is
  * NOT guaranteed bit-identical across engines (JVM Math.log and
  * DuckDB's libm may differ in the last ulp), so the oracle-checked
  * registry query exposes the exact-rational columns (tf, dl, df_t,
  * tf_norm) and the rank — within a term idf is constant, so ranking by
  * tf_norm IS the BM25 ranking — while the full idf-weighted score stays
  * in this API and is property-tested in PipelineSpec.
  */
object Ranking {

  /** Per-(term, doc) BM25 components + rank, top `topK` docs per term.
    * tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). */
  def bm25PerTerm(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                  topK: Int = 10): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val w = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("id"), w.as("w"),
      size(w).cast("long").as("dl"))
    // sparse posting list: fan out over the (tiny, broadcast) term list,
    // count in-doc occurrences, keep only hits
    val postings = base
      .crossJoin(broadcast(terms.toDF("term")))
      .withColumn("tf", expr("size(filter(w, x -> x = term))").cast("long"))
      .filter(col("tf") > 0)
      .select(col("term"), col("id"), col("tf"), col("dl"))
    val corpus = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfPerTerm = postings.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val tfD = col("tf").cast("double")
    // constants composed with runtime IEEE ops (k1 + 1, 1 - b) rather
    // than Scala-folded literals, so the oracle can write the identical
    // expression (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)) and land on
    // the identical double
    val tfNorm = tfD * (lit(k1) + lit(1.0)) /
      (tfD + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl").cast("double") / avgdl)))
    val scored = postings
      .join(broadcast(dfPerTerm), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("tf_norm", tfNorm)
    // bounded per-term top-k: a hot term's posting list (a stopword
    // query) is corpus-scale, and a row_number window over it would sort
    // the whole list in one task. The TopK aggregator keeps O(k) state
    // with map-side partial merge (same order: tf_norm desc, id asc);
    // the tiny |terms| x k winner set then broadcast-joins back onto the
    // scored postings for the payload columns — two map-side passes over
    // the postings, zero corpus-sized shuffles.
    val top = graft.ops.TopK.topKPerGroupStr(
      scored.select(col("term"), col("tf_norm"), col("id")),
      "term", "tf_norm", "id", topK)
    scored.join(broadcast(top.select(col("term"), col("id"), col("rank"))),
        Seq("term", "id"))
      .select(col("term"), col("id"), col("tf"), col("dl"), col("df_t"),
        col("n_docs"), col("tf_norm"), col("rank"))
  }

  /** Full BM25 score (idf-weighted) — see the class note on why this is
    * spec-verified rather than oracle-hashed. */
  def withBm25Score(perTerm: DataFrame): DataFrame = {
    val n = col("n_docs").cast("double")
    val dfT = col("df_t").cast("double")
    val idf = log((n - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0))
    perTerm.withColumn("bm25", idf * col("tf_norm"))
  }

  /** Query-vs-corpus exact n-gram Jaccard top-k — the SPARSE retrieval
    * arm of hybrid search (the dense arm is
    * [[Embeddings.bruteForceKnn]] / the ANN family). Unlike the dedup
    * operators' pair joins, this is asymmetric: the query set is small,
    * so its shingle relation broadcasts and the corpus's shingle relation
    * is scanned once with NO corpus-sized shuffle before the bounded
    * per-query top-k. Output: (query_id, neighbor_id, rank, jac) with
    * rank by (jac desc, neighbor_id asc) — the single IEEE division
    * inter/(nq+nd−inter) over exact counts, so the ranking (and the
    * score itself) is reproducible bit-for-bit in any engine.
    */
  def jaccardTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                  textCol: String, k: Int, n: Int = 3): DataFrame = {
    val sh = TextDedup.shingles(corpus, idCol, textCol, n)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("nd"))
    val qsh = TextDedup.shingles(queries, idCol, textCol, n)
      .withColumnRenamed("id", "qid")
    val qsizes = qsh.groupBy(col("qid")).agg(count(lit(1)).as("nq"))
    val inter = broadcast(qsh).join(sh, "shingle")
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid"), col("id")).agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(broadcast(qsizes), "qid")
      .join(sizes, "id")
      .select(col("qid"), col("id"),
        (col("inter").cast("double") /
          (col("nq") + col("nd") - col("inter")).cast("double")).as("jac"))
    graft.ops.TopK.topKPerGroup(scored, "qid", "jac", "id", k)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        col("rank"), col("jac"))
  }

  /** Reciprocal rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse per-query rankings from independent retrieval systems by
    * score(d) = Σ_s 1/(c + rank_s(d)), missing-from-a-list terms
    * contributing 0. Rank lists are per-query bounded, so the fusion
    * join and the final bounded top-k are list-sized — the corpus is
    * never touched here, which is the whole point of fusing RANKS
    * instead of incomparable raw scores. Each term is one IEEE division
    * of integers and the terms are summed in the given fixed order, so
    * the fused score is bit-reproducible cross-engine (unlike
    * score-normalization fusion, which needs transcendental softmax/
    * z-score steps).
    *
    * `rankings` each expose (query_id, neighbor_id, rank). Output:
    * (query_id, neighbor_id, rank, rrf), top `k` per query by
    * (rrf desc, neighbor_id asc).
    */
  def rrfFuse(rankings: Seq[DataFrame], c: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val sides = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("neighbor_id"), col("rank").as(s"__r$i"))
    }
    val joined = sides.reduce(
      (a, b) => a.join(b, Seq("query_id", "neighbor_id"), "full_outer"))
    val score = sides.indices
      .map(i => coalesce(lit(1.0) / (lit(c) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    val fused = joined.select(col("query_id"), col("neighbor_id"),
      score.as("rrf"))
    graft.ops.TopK.topKPerGroup(fused, "query_id", "rrf", "neighbor_id", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("rrf"))
  }
}
