package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model training and perplexity-based
  * quality scoring (Jurafsky & Martin ch. 3, public; the
  * perplexity-filter idea is the CCNet/Wenzek et al. 2019 pipeline —
  * public paper). Train a bigram LM on the corpus with add-k smoothing,
  * then score each document by average negative log-probability;
  * low-perplexity ≈ fluent under the corpus distribution, and the score
  * feeds the same keep/weight machinery as [[Cleaning]].
  *
  * Scale shape: training is two shuffles with map-side partial
  * aggregation (bigram counts, unigram counts) whose output is
  * vocabulary-sized, not corpus-sized; scoring joins each document's
  * bigram multiset against the model — at real vocabulary sizes that is
  * a shuffle hash join keyed by the bigram, at toy sizes Catalyst
  * broadcasts the model. No per-executor model replication beyond the
  * broadcast, no driver-side state.
  */
object LangModel {

  /** Per-document bigram multiset: (id, w1, w2, c) — adjacent word pairs
    * with in-document multiplicity. Sentence-boundary marker `<s>`
    * precedes the first word, so P(first|<s>) is modeled too. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        concat(array(lit("<s>")), split(col(textCol), " ")).as("w"))
      .select(col("id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
        .as("bg"))
      .groupBy(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))

  /** Corpus bigram counts: (w1, w2, n). */
  def bigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docBigrams(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("n"))

  /** Corpus unigram (context) counts over the same token stream,
    * including the `<s>` markers: (w1, n1). */
  def contextCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(concat(array(lit("<s>")), split(col(textCol), " ")).as("w"))
      .select(explode(expr("slice(w, 1, size(w) - 1)")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("n1"))

  /** Score each document under the add-k-smoothed bigram model trained on
    * `corpus`: P(w2|w1) = (n(w1,w2) + k) / (n1(w1) + k*V) where V is the
    * event vocabulary size (distinct second-position words + OOV). Output
    * per doc: (id, n_bigrams, sum_nll, avg_nll, perplexity) with
    * perplexity = exp(avg_nll).
    *
    * Held-out docs may contain bigrams the model never saw — the left
    * join leaves n null and the coalesce gives them the pure-smoothing
    * mass k / (n1 + kV) (or k / kV for an unseen context). */
  def perplexity(docs: DataFrame, corpus: DataFrame,
                 idCol: String, textCol: String, k: Double = 0.5): DataFrame = {
    val s = docs.sparkSession
    val bg = bigramCounts(corpus, idCol, textCol)
    val ctx = contextCounts(corpus, idCol, textCol)
    val vocab = bg.agg((countDistinct(col("w2")) + lit(1L)).as("v")) // +1 OOV
    val docBg = docBigrams(docs, idCol, textCol)
    val p = (coalesce(col("n"), lit(0L)).cast("double") + lit(k)) /
      (coalesce(col("n1"), lit(0L)).cast("double") + lit(k) * col("v").cast("double"))
    docBg
      .join(bg, Seq("w1", "w2"), "left_outer")
      .join(ctx, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(-log(p) * col("c").cast("double")).as("sum_nll"))
      .withColumn("avg_nll", col("sum_nll") / col("n_bigrams").cast("double"))
      .withColumn("perplexity", exp(col("avg_nll")))
  }

  /** Collocation mining by pointwise mutual information. PMI =
    * ln(P(w1,w2) / (P(w1)P(w2))) — but ln is monotone, so ranking by the
    * RAW ratio n(w1,w2)*T / (n(w1)*n(w2)) is the PMI ranking without
    * touching a transcendental: the ratio is two IEEE multiplies and one
    * divide over exact integer counts, bit-identical in any engine (the
    * same dodge as BM25's tf_norm — keep the cross-engine-unstable
    * function out of the oracle-checked surface). `minCount` drops the
    * noise floor (rare pairs trivially max PMI). One aggregation pass
    * over the corpus; unigram totals join back on the word key.
    *
    * The unigram joins carry NO broadcast hint on purpose: `uni` is the
    * full vocabulary — 10⁷–10⁸ rows at 100 TB — and a forced broadcast
    * means a driver collect that can blow the broadcast limit. Unhinted,
    * they are shuffle joins keyed by w1/w2 at scale, and AQE still
    * converts them to broadcasts at runtime when the vocabulary is
    * actually small. The only hinted side is `tot`, a 1-row aggregate —
    * bounded by construction. PlanShapeSpec pins that exactly one
    * broadcast hint (the scalar) survives in the analyzed plan. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5L, topK: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = bigramCounts(docs, idCol, textCol)
      .filter(col("w1") =!= "<s>" && col("n") >= minCount)
    val uni = contextCounts(docs, idCol, textCol).filter(col("w1") =!= "<s>")
    val tot = bg.agg(sum(col("n")).as("t"))
    val scored = bg
      .join(uni, Seq("w1"))
      .join(uni.select(col("w1").as("w2"), col("n1").as("n2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_ratio",
        col("n").cast("double") * col("t").cast("double")
          / (col("n1").cast("double") * col("n2").cast("double")))
    // distributed top-k (TakeOrderedAndProject), then rank the K
    // survivors — a row_number window over the full bigram relation
    // would funnel it through one partition
    scored.orderBy(col("pmi_ratio").desc, col("w1"), col("w2")).limit(topK)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("pmi_ratio").desc, col("w1"), col("w2"))))
      .select(col("w1"), col("w2"), col("n"), col("n1"), col("n2"),
        col("t"), col("pmi_ratio"), col("rank"))
  }

  /** Exact-INTEGER certificate of the perplexity scoring join — the same
    * docBigrams ⋈ model ⋈ context plan as [[perplexityExact]], but the
    * per-doc outputs are integer sufficient statistics of the score
    * instead of the score: token count, Σ numerator counts, Σ context
    * counts, the vocabulary constant, and an order-free md5 digest of
    * the full (w1, w2, n, n1) term multiset (each term hashed to 40
    * bits, multiplicity-weighted, summed — overflow-free in int64 and
    * bit-identical in any engine). Together these pin that the
    * DISTRIBUTED part of the computation — training counts and the
    * scoring join — produced exactly the oracle's term multiset; the
    * remaining ln/exp is row-local arithmetic whose last-ulp engine
    * drift keeps [[perplexityExact]] itself rows-only (PipelineSpec pins
    * its values against hand computation). The same exact-regime-twin
    * pattern as `knn_ann_ivf_exh` / `dedup_simhash_md5`. */
  def perplexityTerms(docs: DataFrame, corpus: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val bg = bigramCounts(corpus, idCol, textCol)
    val ctx = contextCounts(corpus, idCol, textCol)
    val vocab = bg.agg((countDistinct(col("w2")) + lit(1L)).as("v"))
    val docBg = docBigrams(docs, idCol, textCol)
    val nC = coalesce(col("n"), lit(0L))
    val n1C = coalesce(col("n1"), lit(0L))
    // 40-bit md5 prefix per term: doc-sized multiplicity × 2^40 stays
    // far under 2^63, and both engines parse the same hex prefix
    val h = conv(substring(md5(concat_ws("|", col("w1"), col("w2"),
        nC.cast("string"), n1C.cast("string"))), 1, 15), 16, 10)
      .cast("long") % lit(1099511627776L)
    docBg
      .join(bg, Seq("w1", "w2"), "left_outer")
      .join(ctx, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * nC).as("sum_n"),
        sum(col("c") * n1C).as("sum_n1"),
        sum(col("c") * h).as("term_digest"),
        min(col("v")).as("v"))
  }

  /** Dialect-shared construction of ln(x) for a POSITIVE INTEGER column
    * in nothing but +, -, *, / — the four IEEE-754 operations every
    * engine computes bit-identically (transcendental library calls do
    * NOT share that guarantee: JVM Math.log and DuckDB's libm disagree
    * in the last ulp on ~2% of inputs, which is what kept the perplexity
    * score rows-only). Construction:
    *
    *   e  = floor(log2 x)        — exactly, from the bit length of x
    *   p  = 2^e                  — exactly, one integer shift
    *   t  = (x - p) / (x + p)    — exact integer numerator/denominator,
    *                               ONE double divide; t ∈ [0, 1/3)
    *   ln x = e·LN2 + 2t·(1 + t²/3 + t⁴/5 + … + t³⁶/37)   (atanh series)
    *
    * The 19-term Horner truncation error is ≤ (1/9)^19 ≈ 7e-19 relative
    * — below double resolution — and every constant (LN2, 1/3, 1/5, …)
    * is itself produced by one IEEE divide both engines perform
    * identically. The SAME template renders the Spark expression and the
    * DuckDB oracle text, so the two trees cannot drift structurally.
    * This is what lets the perplexity score be oracle-checked
    * END-TO-END: quantize each term's series-ln to integer nanonats
    * (both engines floor the identical double) and integer-sum —
    * order-free, overflow-free, bit-exact. */
  private[graft] object ExactLn {
    // Every fractional constant is spelled as an EXPLICIT double (string
    // cast for ln2, integer-cast division for the series coefficients):
    // a bare `1.0/37.0` parses as DECIMAL division in Spark SQL but
    // promotes to double in DuckDB — decimal-rounded coefficients threw
    // the two engines ~5e-9 apart before this (measured on x=3).
    val Ln2 = "CAST('0.6931471805599453' AS DOUBLE)" // nearest double to ln 2

    /** floor(log2 x) from the bit length of a positive integer. */
    def e(x: String, duck: Boolean): String =
      if (duck) s"(length(format('{:b}', $x)) - 1)"
      else s"(length(bin($x)) - 1)"

    /** 2^e as an exact BIGINT. */
    def pow2(eCol: String, duck: Boolean): String =
      if (duck) s"(CAST(1 AS BIGINT) << $eCol)"
      else s"shiftleft(CAST(1 AS BIGINT), $eCol)"

    /** t = (x - p)/(x + p) — both operands exact integers. */
    def t(x: String, p: String): String =
      s"(CAST(($x - $p) AS DOUBLE) / CAST(($x + $p) AS DOUBLE))"

    private def inv(d: Int): String =
      s"(CAST(1 AS DOUBLE) / CAST($d AS DOUBLE))"

    /** Horner form of 1 + s/3 + s²/5 + … + s¹⁸/37 over column `s`. */
    def horner(s: String): String =
      (35 to 1 by -2).foldLeft(inv(37)) { (acc, d) =>
        s"(($acc * $s) + ${inv(d)})"
      }

    /** ln x = e·LN2 + 2·t·poly. */
    def ln(eCol: String, tCol: String, polyCol: String): String =
      s"(CAST($eCol AS DOUBLE) * $Ln2 + CAST(2 AS DOUBLE) * $tCol * $polyCol)"

    /** ⌊v·10⁹⌋ as BIGINT — the nanonat quantizer both engines floor on
      * the identical double. */
    def nanoFloor(v: String): String =
      s"CAST(floor($v * CAST(1000000000 AS DOUBLE)) AS BIGINT)"
  }

  /** ORACLE-EXACT perplexity: the same add-k(=0.5) bigram model and
    * scoring join as [[perplexity]], with the per-term negative log
    * likelihood computed by [[ExactLn]]'s series (p = (2n+1)/(2·n1+V) →
    * nll = ln(2·n1+V) - ln(2n+1)), quantized to integer NANONATS with
    * floor, and integer-summed per doc — order-free, so no sorted-fold
    * gymnastics, and bit-identical to the DuckDB mirror end-to-end.
    * Output per doc: (id, n_bigrams, nll_nano = Σ c·⌊nll·10⁹⌋,
    * avg_nll_nano = nll_nano div n_bigrams, v). perplexity =
    * exp(avg_nll_nano / 10⁹) is one row-local exp away; the exp itself
    * stays out of the checked surface (libm drift), costing the result
    * nothing but a unit change. */
  def perplexityFixed(docs: DataFrame, corpus: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val bg = bigramCounts(corpus, idCol, textCol)
    val ctx = contextCounts(corpus, idCol, textCol)
    val vocab = bg.agg((countDistinct(col("w2")) + lit(1L)).as("v"))
    val docBg = docBigrams(docs, idCol, textCol)
    val E = ExactLn
    docBg
      .join(bg, Seq("w1", "w2"), "left_outer")
      .join(ctx, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .withColumn("a", expr("CAST(2 * coalesce(n, 0) + 1 AS BIGINT)"))
      .withColumn("bd", expr("CAST(2 * coalesce(n1, 0) + v AS BIGINT)"))
      .withColumn("ea", expr(E.e("a", duck = false)))
      .withColumn("eb", expr(E.e("bd", duck = false)))
      .withColumn("pa", expr(E.pow2("ea", duck = false)))
      .withColumn("pb", expr(E.pow2("eb", duck = false)))
      .withColumn("ta", expr(E.t("a", "pa")))
      .withColumn("tb", expr(E.t("bd", "pb")))
      .withColumn("sa", expr("ta * ta"))
      .withColumn("sb", expr("tb * tb"))
      .withColumn("qa", expr(E.horner("sa")))
      .withColumn("qb", expr(E.horner("sb")))
      .withColumn("lna", expr(E.ln("ea", "ta", "qa")))
      .withColumn("lnb", expr(E.ln("eb", "tb", "qb")))
      .withColumn("nllq", expr(E.nanoFloor("(lnb - lna)")))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("nllq")).as("nll_nano"),
        min(col("v")).as("v"))
      .withColumn("avg_nll_nano", expr("nll_nano div n_bigrams"))
      .select(col("id"), col("n_bigrams"), col("nll_nano"),
        col("avg_nll_nano"), col("v"))
  }

  /** The DuckDB mirror of [[perplexityFixed]]'s scoring tail, rendered
    * from the SAME [[ExactLn]] template (CTE stages stand in for the
    * withColumn chain). `prefix` must bind CTEs docbg(id,w1,w2,c),
    * bg(w1,w2,n), ctx(w1,n1), vv(v). */
  def perplexityFixedSqlTail: String = {
    val E = ExactLn
    s"""terms AS (
       |  SELECT id, c,
       |    CAST(2 * coalesce(n, 0) + 1 AS BIGINT) AS a,
       |    CAST(2 * coalesce(n1, 0) + v AS BIGINT) AS bd
       |  FROM docbg
       |  LEFT JOIN bg USING (w1, w2)
       |  LEFT JOIN ctx USING (w1)
       |  CROSS JOIN vv),
       |s1 AS (SELECT *, ${E.e("a", duck = true)} AS ea,
       |  ${E.e("bd", duck = true)} AS eb FROM terms),
       |s2 AS (SELECT *, ${E.pow2("ea", duck = true)} AS pa,
       |  ${E.pow2("eb", duck = true)} AS pb FROM s1),
       |s3 AS (SELECT *, ${E.t("a", "pa")} AS ta,
       |  ${E.t("bd", "pb")} AS tb FROM s2),
       |s4 AS (SELECT *, ta * ta AS sa, tb * tb AS sb FROM s3),
       |s5 AS (SELECT *, ${E.horner("sa")} AS qa,
       |  ${E.horner("sb")} AS qb FROM s4),
       |s6 AS (SELECT *, ${E.ln("ea", "ta", "qa")} AS lna,
       |  ${E.ln("eb", "tb", "qb")} AS lnb FROM s5),
       |s7 AS (SELECT id, c,
       |  ${E.nanoFloor("(lnb - lna)")} AS nllq FROM s6)
       |SELECT id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |  CAST(sum(c * nllq) AS BIGINT) AS nll_nano,
       |  CAST(sum(c * nllq) // sum(c) AS BIGINT) AS avg_nll_nano,
       |  (SELECT v FROM vv) AS v
       |FROM s7 GROUP BY id""".stripMargin
  }

  /** [[perplexity]] with a DETERMINISTIC accumulation order: each doc's
    * per-bigram NLL terms are sorted by (w1, w2) and summed in one
    * left-to-right fold, so the score is bit-identical across reruns,
    * partitionings, and engines that share the fold order (the same
    * reproducibility contract as the hash samplers — a quality filter
    * that flickers across retries silently changes the corpus).
    * sum(double) in a shuffle does not commit to an order; this does. */
  def perplexityExact(docs: DataFrame, corpus: DataFrame,
                      idCol: String, textCol: String, k: Double = 0.5): DataFrame = {
    val bg = bigramCounts(corpus, idCol, textCol)
    val ctx = contextCounts(corpus, idCol, textCol)
    val vocab = bg.agg((countDistinct(col("w2")) + lit(1L)).as("v"))
    val docBg = docBigrams(docs, idCol, textCol)
    val p = (coalesce(col("n"), lit(0L)).cast("double") + lit(k)) /
      (coalesce(col("n1"), lit(0L)).cast("double") + lit(k) * col("v").cast("double"))
    docBg
      .join(bg, Seq("w1", "w2"), "left_outer")
      .join(ctx, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("c"),
        (-log(p) * col("c").cast("double")).as("nll"),
        struct(col("w1"), col("w2"), (-log(p) * col("c").cast("double")).as("nll")).as("term"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_bigrams"),
        aggregate(array_sort(collect_list(col("term"))), lit(0.0),
          (acc, t) => acc + t.getField("nll")).as("sum_nll"))
      .withColumn("avg_nll", col("sum_nll") / col("n_bigrams").cast("double"))
      .withColumn("perplexity", exp(col("avg_nll")))
  }
}
