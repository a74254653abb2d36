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
}
