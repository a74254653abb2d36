package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Cleaning, LangModel, LineOps, Packing, Ranking, Sampling, SpanTrim}

/** Training-data pipeline queries (round 4): deterministic sampling and
  * mixture re-weighting, PII redaction, Gopher-style repetition
  * filters, BM25 ranking, chunking, and sequence packing — each with a
  * bit-exact DuckDB oracle mirror.
  */
object PipelineQueries {

  // ---- deterministic sampling ----

  private def sampleHash(s: SparkSession, d: String): DataFrame =
    Sampling.hashSample(Tables.documents(s, d), "doc_id",
      Sampling.rateToHex(0.1)) // "199a"

  private val sampleHashSql: String =
    """SELECT doc_id, text, lang, source, n_chars FROM documents
      |WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a'""".stripMargin

  /** Leakage-free dataset split (`Sampling.groupSplit`): orders split
    * train/valid/test by the CUSTOMER's hash, so no customer straddles
    * splits (the leakage guarantee a row-level split can't give);
    * summarized per split. GroupSplitSpec pins the one-split-per-group
    * property; the oracle certifies the assignment function itself. */
  private def groupSplit(s: SparkSession, d: String): DataFrame =
    Sampling.groupSplit(Tables.orders(s, d), "o_custkey",
        Seq(("train", "8000"), ("valid", "c000"),
          ("test", Sampling.fullRateHex)))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("split"))

  private val groupSplitSql: String =
    """WITH a AS (SELECT
      |  CASE WHEN substr(md5('graft-split' || CAST(o_custkey AS VARCHAR)), 1, 4)
      |         < '8000' THEN 'train'
      |       WHEN substr(md5('graft-split' || CAST(o_custkey AS VARCHAR)), 1, 4)
      |         < 'c000' THEN 'valid'
      |       ELSE 'test' END AS split, o_custkey
      |  FROM orders)
      |SELECT split, count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  private def sampleStratified(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(s, d), "doc_id", "source",
      rates = Map("src0" -> Sampling.rateToHex(0.5),   // "8000"
                  "src1" -> Sampling.rateToHex(0.25),  // "4000"
                  "src2" -> Sampling.rateToHex(0.05)), // "0ccd"
      defaultHex = Sampling.rateToHex(0.1))            // "199a"
      .select(col("doc_id"), col("source"))

  private val sampleStratifiedSql: String =
    """SELECT doc_id, source FROM documents
      |WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) <
      |  CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '4000'
      |              WHEN 'src2' THEN '0ccd' ELSE '199a' END""".stripMargin

  private def mixtureWeights(s: SparkSession, d: String): DataFrame =
    Sampling.mixtureWeights(Tables.documents(s, d), "source", "text",
      targets = Map("src0" -> 0.2, "src1" -> 0.1),
      defaultTarget = 0.7 / 18.0) // remaining 18 strata share 0.7 evenly

  private val mixtureWeightsSql: String =
    """WITH per AS (SELECT source AS stratum, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per)
      |SELECT stratum, n_docs, n_tokens,
      |  CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS actual_frac,
      |  CASE WHEN stratum = 'src0' THEN CAST(0.2 AS DOUBLE)
      |       WHEN stratum = 'src1' THEN CAST(0.1 AS DOUBLE)
      |       ELSE CAST(0.7 AS DOUBLE) / CAST(18 AS DOUBLE) END AS target_frac,
      |  (CASE WHEN stratum = 'src0' THEN CAST(0.2 AS DOUBLE)
      |        WHEN stratum = 'src1' THEN CAST(0.1 AS DOUBLE)
      |        ELSE CAST(0.7 AS DOUBLE) / CAST(18 AS DOUBLE) END)
      |    * CAST(total_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS weight
      |FROM per, tot""".stripMargin

  // ---- cleaning ----

  /** The corpus has no planted PII, so the query synthesizes a
    * deterministic contact line per doc before redacting — exercising
    * all three patterns with nonzero counts while staying oracle-exact
    * (the synthesis is the same pure expression on both sides). */
  private def piiRedact(s: SparkSession, d: String): DataFrame = {
    val synth = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" Contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or call 555-123-4567 from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".9 now")).as("text"))
    Cleaning.piiRedact(synth, "doc_id", "text")
  }

  private val piiRedactSql: String = {
    import Cleaning.{emailRe, phoneRe, ipRe}
    s"""WITH t AS (SELECT doc_id AS id,
       |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
       |      || '@mail.example.com or call 555-123-4567 from 10.0.'
       |      || CAST(doc_id % 256 AS VARCHAR) || '.9 now' AS t0
       |  FROM documents),
       |r1 AS (SELECT id, t0, regexp_replace(t0, '$emailRe', '<EMAIL>', 'g') AS t1 FROM t),
       |r2 AS (SELECT id, t0, t1, regexp_replace(t1, '$phoneRe', '<PHONE>', 'g') AS t2 FROM r1)
       |SELECT id,
       |  len(regexp_extract_all(t0, '$emailRe')) AS n_emails,
       |  len(regexp_extract_all(t1, '$phoneRe')) AS n_phones,
       |  len(regexp_extract_all(t2, '$ipRe')) AS n_ips,
       |  regexp_replace(t2, '$ipRe', '<IP>', 'g') AS redacted
       |FROM r2""".stripMargin
  }

  private def gopherRepetition(s: SparkSession, d: String): DataFrame =
    Cleaning.repetitionStats(Tables.documents(s, d), "doc_id", "text")

  private val gopherRepetitionSql: String =
    """WITH base AS (SELECT doc_id AS id, len(string_split(text, ' ')) AS n_words,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
      |    length(text) AS n_chars FROM documents),
      |top AS (SELECT id, max(c) AS top_word_count FROM (
      |    SELECT doc_id AS id, wd, count(*) AS c FROM (
      |      SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents) u
      |    GROUP BY doc_id, wd) g
      |  GROUP BY id),
      |j AS (SELECT base.id, n_words, n_distinct_words, n_chars, top_word_count,
      |    CAST(n_words - n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
      |    CAST(top_word_count AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
      |    CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len
      |  FROM base JOIN top ON base.id = top.id)
      |SELECT *, (dup_word_frac <= CAST(0.3 AS DOUBLE)
      |  AND top_word_frac <= CAST(0.2 AS DOUBLE)
      |  AND mean_word_len >= CAST(3.0 AS DOUBLE)
      |  AND mean_word_len <= CAST(10.0 AS DOUBLE)) AS keep
      |FROM j""".stripMargin

  // ---- ranking ----

  private val bm25Terms = Seq("the", "and", "of")

  private def bm25Top(s: SparkSession, d: String): DataFrame =
    Ranking.bm25PerTerm(Tables.documents(s, d), "doc_id", "text", bm25Terms,
      k1 = 1.2, b = 0.75, topK = 10)

  private val bm25TopSql: String =
    """WITH base AS (SELECT doc_id AS id, string_split(text, ' ') AS w,
      |    len(string_split(text, ' ')) AS dl FROM documents),
      |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
      |postings AS (
      |  SELECT t.term, b.id,
      |    CAST(len(list_filter(b.w, x -> x = t.term)) AS BIGINT) AS tf, b.dl
      |  FROM base b CROSS JOIN (SELECT unnest(['the', 'and', 'of']) AS term) t
      |  WHERE len(list_filter(b.w, x -> x = t.term)) > 0),
      |dft AS (SELECT term, count(*) AS df_t FROM postings GROUP BY 1),
      |scored AS (SELECT p.term, p.id, p.tf, p.dl, d.df_t, c.n_docs,
      |    CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
      |      / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |         * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
      |            + CAST(0.75 AS DOUBLE) * (CAST(p.dl AS DOUBLE)
      |              / (CAST(c.sum_dl AS DOUBLE) / CAST(c.n_docs AS DOUBLE))))) AS tf_norm
      |  FROM postings p JOIN dft d ON p.term = d.term CROSS JOIN corpus c)
      |SELECT term, id, tf, dl, df_t, n_docs, tf_norm, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY term
      |    ORDER BY tf_norm DESC, id) AS rank FROM scored) ranked
      |WHERE rank <= 10""".stripMargin

  // ---- context-window preparation ----

  private def docChunks(s: SparkSession, d: String): DataFrame =
    Packing.chunk(Tables.documents(s, d), "doc_id", "text",
      size = 20, stride = 10)

  private val docChunksSql: String =
    """WITH d AS (SELECT doc_id AS id, string_split(text, ' ') AS w,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |s AS (SELECT id, w, n, unnest(range(1, n + 1, 10)) AS s FROM d)
      |SELECT id, (s - 1) // 10 AS chunk_idx,
      |  array_to_string(list_slice(w, s, least(s + 19, n)), ' ') AS chunk_text,
      |  least(20, n - s + 1) AS chunk_tokens
      |FROM s""".stripMargin

  private def seqPack(s: SparkSession, d: String): DataFrame =
    Packing.nextFitPack(Tables.documents(s, d), "doc_id", "text",
      capacity = 200L, buckets = 32).toDF()

  private val seqPackSql: String =
    """WITH RECURSIVE
      |d AS (SELECT doc_id AS id, CAST(doc_id % 32 AS INTEGER) AS bucket,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |o AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY id) AS rn FROM d),
      |r(id, bucket, n, rn, bin, acc) AS (
      |  SELECT id, bucket, n, rn, CAST(0 AS BIGINT), n FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.id, o.bucket, o.n, o.rn,
      |    CASE WHEN r.acc + o.n > 200 THEN r.bin + 1 ELSE r.bin END,
      |    CASE WHEN r.acc + o.n > 200 THEN o.n ELSE r.acc + o.n END
      |  FROM r JOIN o ON o.bucket = r.bucket AND o.rn = r.rn + 1)
      |SELECT id, bucket, bin, n FROM r""".stripMargin

  // ---- C4-style line/span operations ----

  /** Lines = non-overlapping 8-word spans (the corpus has no newlines);
    * the SQL below mirrors the same spanning. */
  private val lineWords = 8

  private val linesCte: String =
    s"""d AS (SELECT doc_id AS id, string_split(text, ' ') AS w,
       |    len(string_split(text, ' ')) AS n FROM documents),
       |sp AS (SELECT id, w, n, unnest(range(1, n + 1, $lineWords)) AS s FROM d),
       |l AS (SELECT id, (s - 1) // $lineWords AS line_idx,
       |    array_to_string(list_slice(w, s, least(s + ${lineWords - 1}, n)), ' ') AS line
       |  FROM sp)""".stripMargin

  private def lineDedup(s: SparkSession, d: String): DataFrame =
    LineOps.dedupSpans(
      LineOps.toLines(Tables.documents(s, d), "doc_id", "text", lineWords))

  private val lineDedupSql: String =
    s"""WITH $linesCte,
       |f AS (SELECT *, (row_number() OVER (PARTITION BY line
       |    ORDER BY id, line_idx)) = 1 AS is_first FROM l)
       |SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  string_agg(CASE WHEN is_first THEN line END, ' ' ORDER BY line_idx) AS text
       |FROM f GROUP BY id HAVING n_kept > 0""".stripMargin

  /** The corpus lines carry no punctuation, so the query plants it
    * deterministically — 2 of 3 lines get a terminal '.', and doc
    * id % 97 == 3 gets a banned marker — exercising every branch of the
    * C4 filter with the identical synthesis mirrored in the oracle. */
  private def c4Clean(s: SparkSession, d: String): DataFrame = {
    val lines = LineOps.toLines(Tables.documents(s, d), "doc_id", "text", lineWords)
      .withColumn("line",
        when(col("id") % 97 === 3 && col("line_idx") === 0,
          concat(col("line"), lit(" has lorem ipsum boilerplate.")))
        .otherwise(concat(col("line"),
          when((col("id") + col("line_idx")) % 3 < 2, lit(".")).otherwise(lit("")))))
    LineOps.docFilter(LineOps.lineFilter(lines, minWords = 5), minLines = 3)
  }

  private val c4CleanSql: String =
    s"""WITH $linesCte,
       |syn AS (SELECT id, line_idx,
       |    CASE WHEN id % 97 = 3 AND line_idx = 0
       |         THEN line || ' has lorem ipsum boilerplate.'
       |         ELSE line || (CASE WHEN (id + line_idx) % 3 < 2 THEN '.' ELSE '' END)
       |    END AS line FROM l),
       |lf AS (SELECT *, regexp_matches(line, '[.!?"]$$')
       |    AND len(string_split(line, ' ')) >= 5 AS line_keep FROM syn),
       |agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
       |    CAST(sum(CASE WHEN line_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    max(contains(lower(line), 'lorem ipsum')
       |      OR contains(lower(line), 'javascript')
       |      OR contains(lower(line), '{')) AS has_banned,
       |    coalesce(string_agg(CASE WHEN line_keep THEN line END, ' '
       |      ORDER BY line_idx), '') AS text
       |  FROM lf GROUP BY id)
       |SELECT *, n_kept >= 3 AND NOT has_banned AS keep FROM agg""".stripMargin

  // ---- bigram language model ----

  private def bigramCounts(s: SparkSession, d: String): DataFrame =
    LangModel.bigramCounts(Tables.documents(s, d), "doc_id", "text")

  private val bigramCountsSql: String =
    """WITH d AS (SELECT list_prepend('<s>', string_split(text, ' ')) AS w
      |    FROM documents),
      |u AS (SELECT w, unnest(range(1, len(w))) AS i FROM d)
      |SELECT w[i] AS w1, w[i + 1] AS w2, CAST(count(*) AS BIGINT) AS n
      |FROM u GROUP BY 1, 2""".stripMargin

  private def collocations(s: SparkSession, d: String): DataFrame =
    LangModel.collocations(Tables.documents(s, d), "doc_id", "text",
      minCount = 5L, topK = 50)

  /** PMI ranking without ln: rank by the raw probability ratio (ln is
    * monotone), keeping the oracle bit-exact. */
  private val collocationsSql: String =
    """WITH d AS (SELECT list_prepend('<s>', string_split(text, ' ')) AS w
      |    FROM documents),
      |u AS (SELECT w, unnest(range(1, len(w))) AS i FROM d),
      |bg AS (SELECT w1, w2, n FROM (
      |    SELECT w[i] AS w1, w[i + 1] AS w2, CAST(count(*) AS BIGINT) AS n
      |    FROM u GROUP BY 1, 2) b
      |  WHERE w1 <> '<s>' AND n >= 5),
      |uni AS (SELECT w[i] AS w1, CAST(count(*) AS BIGINT) AS n1
      |  FROM u GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM bg),
      |scored AS (SELECT bg.w1, bg.w2, bg.n, a.n1 AS n1, b.n1 AS n2, tot.t,
      |    CAST(bg.n AS DOUBLE) * CAST(tot.t AS DOUBLE)
      |      / (CAST(a.n1 AS DOUBLE) * CAST(b.n1 AS DOUBLE)) AS pmi_ratio
      |  FROM bg JOIN uni a ON bg.w1 = a.w1
      |          JOIN uni b ON bg.w2 = b.w1
      |          CROSS JOIN tot)
      |SELECT w1, w2, n, n1, n2, t, pmi_ratio, rank FROM (
      |  SELECT *, row_number() OVER (ORDER BY pmi_ratio DESC, w1, w2) AS rank
      |  FROM scored) r
      |WHERE rank <= 50""".stripMargin

  /** Corpus-trained add-k bigram perplexity per doc, ORACLE-EXACT
    * end-to-end ([[graft.llm.LangModel.perplexityFixed]]): the ln that
    * kept this rows-only through round 11 (JVM Math.log vs DuckDB libm
    * drift a last ulp on ~2% of docs) is replaced by a series ln built
    * from nothing but IEEE +,-,*,/ — which the two engines DO compute
    * bit-identically — rendered from one shared template on both sides,
    * then quantized to integer nanonats and integer-summed (order-free).
    * The score is exp(avg_nll_nano/1e9) — one row-local exp the caller
    * applies; everything distributed is hash-checked. The double-typed
    * twin [[lmPerplexityFp]] (perplexityExact) stays available and is
    * value-pinned in PipelineSpec. */
  private def lmPerplexity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    LangModel.perplexityFixed(docs, docs, "doc_id", "text").orderBy(col("id"))
  }

  /** Exact-integer certificate twin of [[lmPerplexity]]
    * (`llm/LangModel.perplexityTerms`): the same docBigrams ⋈ model ⋈
    * context plan, outputs per-doc integer sufficient statistics (token
    * count, Σn, Σn1, vocab, an order-free 40-bit md5 digest of the term
    * multiset) instead of the ln-based score — oracle-checked, so the
    * distributed training + scoring join is driver-certified while the
    * ln twin stays rows-only (the primitive drifts a last ulp between
    * JVM and libm; same pattern as knn_ann_ivf_exh). */
  private def lmPerplexityTerms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    LangModel.perplexityTerms(docs, docs, "doc_id", "text").orderBy(col("id"))
  }

  private val lmPerplexityTermsSql: String =
    """WITH d AS (SELECT doc_id AS id,
      |    list_prepend('<s>', string_split(text, ' ')) AS w FROM documents),
      |u AS (SELECT id, w, unnest(range(1, len(w))) AS i FROM d),
      |docbg AS (SELECT id, w[i] AS w1, w[i + 1] AS w2,
      |    CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2, 3),
      |bg AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS n FROM docbg GROUP BY 1, 2),
      |ctx AS (SELECT w[i] AS w1, CAST(count(*) AS BIGINT) AS n1 FROM u GROUP BY 1),
      |vv AS (SELECT CAST(count(DISTINCT w2) + 1 AS BIGINT) AS v FROM bg)
      |SELECT id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  CAST(sum(c * coalesce(n, 0)) AS BIGINT) AS sum_n,
      |  CAST(sum(c * coalesce(n1, 0)) AS BIGINT) AS sum_n1,
      |  CAST(sum(c * (CAST(concat('0x', substr(md5(
      |      w1 || '|' || w2 || '|' || CAST(coalesce(n, 0) AS VARCHAR)
      |      || '|' || CAST(coalesce(n1, 0) AS VARCHAR)), 1, 15)) AS BIGINT)
      |    % 1099511627776)) AS BIGINT) AS term_digest,
      |  min(vv.v) AS v
      |FROM docbg LEFT JOIN bg USING (w1, w2) LEFT JOIN ctx USING (w1)
      |CROSS JOIN vv
      |GROUP BY id ORDER BY id""".stripMargin

  /** [[lmPerplexity]]'s oracle: the terms oracle's model CTEs + the
    * scoring tail rendered from the SAME ExactLn template as the Spark
    * side ([[graft.llm.LangModel.perplexityFixedSqlTail]]). */
  private val lmPerplexitySql: String =
    """WITH d AS (SELECT doc_id AS id,
      |    list_prepend('<s>', string_split(text, ' ')) AS w FROM documents),
      |u AS (SELECT id, w, unnest(range(1, len(w))) AS i FROM d),
      |docbg AS (SELECT id, w[i] AS w1, w[i + 1] AS w2,
      |    CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2, 3),
      |bg AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS n FROM docbg GROUP BY 1, 2),
      |ctx AS (SELECT w[i] AS w1, CAST(count(*) AS BIGINT) AS n1 FROM u GROUP BY 1),
      |vv AS (SELECT CAST(count(DISTINCT w2) + 1 AS BIGINT) AS v FROM bg),
      |""".stripMargin +
      graft.llm.LangModel.perplexityFixedSqlTail + "\nORDER BY id"

  private def dupSpanFraction(s: SparkSession, d: String): DataFrame =
    LineOps.duplicatedSpanFraction(Tables.documents(s, d), "doc_id", "text", n = 8)

  private val dupSpanFractionSql: String =
    """WITH d AS (SELECT doc_id AS id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT id, array_to_string(list_slice(w, i, i + 7), ' ') AS g
      |  FROM (SELECT id, w, unnest(range(1, len(w) - 6)) AS i FROM d
      |        WHERE len(w) >= 8) t),
      |df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1),
      |per AS (SELECT g.id, CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
      |  FROM g JOIN df ON g.g = df.g GROUP BY 1)
      |SELECT d.id, coalesce(per.n_grams, CAST(0 AS BIGINT)) AS n_grams,
      |  coalesce(per.n_dup_grams, CAST(0 AS BIGINT)) AS n_dup_grams,
      |  coalesce(CAST(per.n_dup_grams AS DOUBLE) / CAST(per.n_grams AS DOUBLE),
      |           CAST(0.0 AS DOUBLE)) AS dup_fraction
      |FROM d LEFT JOIN per ON d.id = per.id""".stripMargin

  /** Exact-substring span TRIM ([[SpanTrim.trimDuplicatedSpans]]): cut
    * every maximal token run covered by a cross-document duplicated
    * 8-gram, returning the per-doc edit report plus the trimmed text —
    * the positional edit `dup_span_fraction` only measures. */
  private def dupSpanTrim(s: SparkSession, d: String): DataFrame =
    SpanTrim.trimDuplicatedSpans(Tables.documents(s, d), "doc_id", "text",
      width = 8, minDocs = 2)

  private val dupSpanTrimSql: String =
    """WITH d AS (SELECT doc_id AS id, string_split(text,' ') AS w FROM documents),
      |t AS (SELECT id, unnest(w) AS tok, generate_subscripts(w, 1) - 1 AS pos FROM d),
      |v AS (SELECT id, i - 1 AS pos, array_to_string(list_slice(w, i, i + 7), ' ') AS g
      |      FROM (SELECT id, w, unnest(range(1, len(w) - 6)) AS i FROM d
      |            WHERE len(w) >= 8) x),
      |dup AS (SELECT g FROM v GROUP BY g HAVING count(DISTINCT id) >= 2),
      |cov AS (SELECT DISTINCT v.id, v.pos + o.o AS cpos
      |        FROM v JOIN dup USING (g) CROSS JOIN range(8) o(o)),
      |isl AS (SELECT id, cpos,
      |          cpos - row_number() OVER (PARTITION BY id ORDER BY cpos) AS grpk
      |        FROM cov),
      |agg AS (SELECT id, CAST(count(DISTINCT grpk) AS BIGINT) AS n_spans,
      |          CAST(count(*) AS BIGINT) AS tokens_removed
      |        FROM isl GROUP BY id),
      |kept AS (SELECT t.id,
      |           coalesce(string_agg(t.tok, ' ' ORDER BY t.pos)
      |             FILTER (WHERE c.cpos IS NULL), '') AS trimmed_text
      |         FROM t LEFT JOIN cov c ON t.id = c.id AND t.pos = c.cpos
      |         GROUP BY t.id)
      |SELECT a.id AS doc_id, a.n_spans, a.tokens_removed, k.trimmed_text
      |FROM agg a JOIN kept k USING (id) ORDER BY doc_id""".stripMargin

  private def epochShuffle(s: SparkSession, d: String): DataFrame =
    Sampling.epochShuffleKeys(
      Tables.documents(s, d).select(col("doc_id")), "doc_id", epochs = 3)

  private val epochShuffleSql: String =
    """SELECT doc_id, epoch,
      |  md5('graft-epoch-' || CAST(epoch AS VARCHAR) || '-'
      |      || CAST(doc_id AS VARCHAR)) AS sort_key
      |FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS epoch) e""".stripMargin

  // ---- benchmark decontamination ----

  /** Pseudo-benchmark = docs with id % 101 == 0 (deterministic stand-in
    * for an eval suite); 8-word-gram overlap marks contamination. */
  private def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    LineOps.contamination(docs, docs.filter(col("doc_id") % 101 === 0),
      "doc_id", "text", n = 8, minShared = 1)
  }

  private val decontaminateSql: String =
    """WITH d AS (SELECT doc_id AS id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT id, array_to_string(list_slice(w, i, i + 7), ' ') AS g
      |  FROM (SELECT id, w, unnest(range(1, len(w) - 6)) AS i FROM d
      |        WHERE len(w) >= 8) t),
      |bg AS (SELECT DISTINCT g FROM g WHERE id % 101 = 0),
      |sh AS (SELECT g.id, CAST(count(*) AS BIGINT) AS n_shared_grams
      |  FROM g JOIN bg ON g.g = bg.g GROUP BY 1)
      |SELECT d.id, coalesce(sh.n_shared_grams, CAST(0 AS BIGINT)) AS n_shared_grams,
      |  coalesce(sh.n_shared_grams, CAST(0 AS BIGINT)) >= 1 AS contaminated
      |FROM d LEFT JOIN sh ON d.id = sh.id""".stripMargin

  /** Fuzzy decontamination (`LineOps.fuzzyContamination`): per-doc best
    * n-gram Jaccard against the same pseudo-benchmark — catches
    * paraphrase-level leakage the shared-gram count can't distinguish
    * from one incidental phrase. Benchmark members self-match at 1.0 by
    * construction. */
  private def decontaminateFuzzy(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    LineOps.fuzzyContamination(docs, docs.filter(col("doc_id") % 101 === 0),
      "doc_id", "text", n = 3, minJaccard = 0.5)
  }

  private val decontaminateFuzzySql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM d)),
      |bsh AS (SELECT doc_id AS b_id, s FROM sh WHERE doc_id % 101 = 0),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |m AS (SELECT a.doc_id AS id, b.b_id,
      |    CAST(count(*) AS DOUBLE) / (s1.n + s2.n - count(*)) AS j
      |  FROM sh a JOIN bsh b ON a.s = b.s
      |    JOIN sizes s1 ON a.doc_id = s1.doc_id
      |    JOIN sizes s2 ON b.b_id = s2.doc_id
      |  GROUP BY a.doc_id, b.b_id, s1.n, s2.n),
      |per AS (SELECT id, count(*) AS n_matched_bench, max(j) AS max_jaccard
      |  FROM m WHERE j >= 0.5 GROUP BY 1)
      |SELECT d0.doc_id AS id,
      |  coalesce(per.n_matched_bench, CAST(0 AS BIGINT)) AS n_matched_bench,
      |  coalesce(per.max_jaccard, 0.0) AS max_jaccard,
      |  coalesce(per.n_matched_bench, CAST(0 AS BIGINT)) >= 1 AS contaminated
      |FROM (SELECT doc_id FROM documents) d0
      |LEFT JOIN per ON d0.doc_id = per.id""".stripMargin

  // ---- end-to-end corpus preparation ----

  private def pipelineE2e(s: SparkSession, d: String): DataFrame =
    graft.llm.Pipeline.prepareCorpus(Tables.documents(s, d), "doc_id", "text",
      sampleHex = Sampling.rateToHex(0.5), capacity = 200L, buckets = 32).toDF()

  /** Gopher keep band -> exact dedup (min id per digest) -> 50% hash
    * sample -> next-fit pack, all in one recursive-CTE mirror. */
  private val pipelineE2eSql: String =
    """WITH RECURSIVE
      |base AS (SELECT doc_id AS id, text, len(string_split(text, ' ')) AS n_words,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
      |    length(text) AS n_chars FROM documents),
      |top AS (SELECT id, max(c) AS top_word_count FROM (
      |    SELECT doc_id AS id, wd, count(*) AS c FROM (
      |      SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents) u
      |    GROUP BY doc_id, wd) g
      |  GROUP BY id),
      |q AS (SELECT base.id, base.text, base.n_words FROM base JOIN top ON base.id = top.id
      |  WHERE CAST(n_words - n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE)
      |          <= CAST(0.3 AS DOUBLE)
      |    AND CAST(top_word_count AS DOUBLE) / CAST(n_words AS DOUBLE)
      |          <= CAST(0.2 AS DOUBLE)
      |    AND CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE)
      |          >= CAST(3.0 AS DOUBLE)
      |    AND CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE)
      |          <= CAST(10.0 AS DOUBLE)),
      |dd AS (SELECT *, row_number() OVER (PARTITION BY md5(lower(text))
      |    ORDER BY id) AS dup_rn FROM q),
      |s AS (SELECT id, n_words FROM dd WHERE dup_rn = 1
      |  AND substr(md5('graft' || CAST(id AS VARCHAR)), 1, 4) < '8000'),
      |o AS (SELECT id, CAST(id % 32 AS INTEGER) AS bucket, n_words AS n,
      |    row_number() OVER (PARTITION BY id % 32 ORDER BY id) AS rn FROM s),
      |r(id, bucket, n, rn, bin, acc) AS (
      |  SELECT id, bucket, n, rn, CAST(0 AS BIGINT), n FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.id, o.bucket, o.n, o.rn,
      |    CASE WHEN r.acc + o.n > 200 THEN r.bin + 1 ELSE r.bin END,
      |    CASE WHEN r.acc + o.n > 200 THEN o.n ELSE r.acc + o.n END
      |  FROM r JOIN o ON o.bucket = r.bucket AND o.rn = r.rn + 1)
      |SELECT id, bucket, bin, n FROM r""".stripMargin

  /** Exact-k deterministic stratified sample ([[Sampling
    * .exactKPerStratum]]): exactly 20 docs per language by salted-hash
    * rank, through the bounded TopK buffer (never a full per-stratum
    * sort). The oracle reproduces the 52-bit rank via
    * '0x&lt;13-hex-md5-prefix&gt;'::BIGINT. */
  private def sampleExactK(s: SparkSession, d: String): DataFrame =
    Sampling.exactKPerStratum(Tables.documents(s, d), "lang", "doc_id",
        k = 20, salt = "k7")
      .orderBy(col("lang"), col("rank"))

  private val sampleExactKSql: String =
    """SELECT lang, doc_id, rank FROM (
      |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
      |    ORDER BY CAST(concat('0x',
      |      substr(md5(concat('k7', CAST(doc_id AS VARCHAR))), 1, 13))
      |      AS BIGINT) DESC, doc_id) AS rank
      |  FROM documents) t
      |WHERE rank <= 20 ORDER BY lang, rank""".stripMargin

  /** Priority sampling ([[Sampling.prioritySample]]): 64 documents
    * weighted by whitespace token count, with the unbiased per-row
    * weight estimate ŵ = max(w, 2^52/τ). All-integer-division
    * arithmetic, so — uniquely among weighted sampling schemes — the
    * whole thing (selection, priorities, AND the estimator) is
    * oracle-hashed. */
  private def samplePriority(s: SparkSession, d: String): DataFrame =
    Sampling.prioritySample(
        Tables.documents(s, d).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", k = 64, salt = "ps7")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("rank"))

  private val samplePrioritySql: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
      |    CAST(concat('0x',
      |      substr(md5(concat('ps7', CAST(doc_id AS VARCHAR))), 1, 13))
      |      AS BIGINT) + 1 AS u
      |  FROM documents),
      |p AS (SELECT doc_id, weight,
      |    CAST(u AS DOUBLE) / CAST(weight AS DOUBLE) AS priority FROM t),
      |o AS (SELECT doc_id, weight, priority,
      |    row_number() OVER (ORDER BY priority, doc_id) AS rank FROM p)
      |SELECT doc_id, weight, priority, rank,
      |  greatest(CAST(weight AS DOUBLE),
      |    coalesce(CAST(4503599627370496 AS DOUBLE) /
      |      (SELECT priority FROM o WHERE rank = 65),
      |      CAST(0.0 AS DOUBLE))) AS w_est
      |FROM o WHERE rank <= 64 ORDER BY rank""".stripMargin

  val all: Seq[Q] = Seq(
    Q("sample_hash", sampleHash, Some(sampleHashSql)),
    Q("sample_exact_k", sampleExactK, Some(sampleExactKSql)),
    Q("sample_priority", samplePriority, Some(samplePrioritySql)),
    Q("sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    Q("group_split", groupSplit, Some(groupSplitSql)),
    Q("mixture_weights", mixtureWeights, Some(mixtureWeightsSql)),
    Q("pii_redact", piiRedact, Some(piiRedactSql)),
    Q("gopher_repetition", gopherRepetition, Some(gopherRepetitionSql)),
    Q("bm25_top", bm25Top, Some(bm25TopSql)),
    Q("doc_chunks", docChunks, Some(docChunksSql)),
    Q("seq_pack", seqPack, Some(seqPackSql)),
    Q("line_dedup", lineDedup, Some(lineDedupSql)),
    Q("c4_clean", c4Clean, Some(c4CleanSql)),
    Q("bigram_counts", bigramCounts, Some(bigramCountsSql)),
    Q("collocations", collocations, Some(collocationsSql)),
    Q("lm_perplexity", lmPerplexity, Some(lmPerplexitySql)),
    Q("lm_perplexity_terms", lmPerplexityTerms, Some(lmPerplexityTermsSql)),
    Q("pipeline_e2e", pipelineE2e, Some(pipelineE2eSql)),
    Q("decontaminate", decontaminate, Some(decontaminateSql)),
    Q("decontaminate_fuzzy", decontaminateFuzzy, Some(decontaminateFuzzySql)),
    Q("epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    Q("dup_span_fraction", dupSpanFraction, Some(dupSpanFractionSql)),
    Q("dup_span_trim", dupSpanTrim, Some(dupSpanTrimSql)),

  )
}
