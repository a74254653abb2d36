package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{DedupPipeline, EditSimilarity, Embeddings, Multimodal, TextDedup, TextStats}

/** North-star LLM-pipeline queries (SURVEY.md §7.1 `engine.llm`):
  * deduplication, embedding similarity, text analysis over the
  * `documents` and `embeddings` tables. Oracle SQL mirrors the Spark
  * arithmetic operation-for-operation (same fold order, same integer →
  * double single divisions) so the driver's bit-exact double compare
  * passes; probabilistic ops (SimHash, sign-LSH ANN) are registered
  * rows-only and property-tested in LlmSpec instead.
  */
object LlmQueries {

  private val dim = 64

  // ---- dedup ----

  private def dedupExact(s: SparkSession, d: String): DataFrame =
    TextDedup.exact(Tables.documents(s, d), "doc_id", "text")

  /** Shared all-pairs exact-Jaccard oracle (word 3-gram shingles). The
    * Spark side never runs all-pairs — MinHash-LSH / prefix filtering
    * generate candidates — but the verified output equals the exact
    * answer (LSH miss probability < 1e-13 at the thresholds used). */
  private def jaccardOracle(threshold: Double): String =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM docs)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id1, id2, jaccard FROM (
       |  SELECT id1, id2,
       |    CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
       |  FROM pairs JOIN sizes s1 ON id1 = s1.doc_id
       |             JOIN sizes s2 ON id2 = s2.doc_id) t
       |WHERE jaccard >= $threshold""".stripMargin

  private def dedupMinhash(s: SparkSession, d: String): DataFrame =
    TextDedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
      threshold = 0.8)

  private def dedupNgram(s: SparkSession, d: String): DataFrame =
    TextDedup.ngramJaccardJoin(Tables.documents(s, d), "doc_id", "text",
      threshold = 0.5)

  /** Edit-distance near-dup pairs on the 80-char prefix: PassJoin
    * segment pigeonhole filter + banded Levenshtein verify. The filter
    * is lossless and the distance exact, so — unlike the probabilistic
    * MinHash/SimHash members of the dedup family — this one is
    * oracle-checked: DuckDB's `levenshtein` agrees character-for-
    * character with Spark's on this ASCII corpus. */
  private def dedupEditDistance(s: SparkSession, d: String): DataFrame =
    EditSimilarity.editDistanceJoin(
      Tables.documents(s, d), "doc_id", "text", t = 6, prefixLen = 80)

  /** Fuzzy decontamination shape: the odd-doc_id "benchmark" set matched
    * against the even-doc_id corpus within edit distance 6 — the
    * two-relation PassJoin, where only the corpus side is segmented and
    * the batch side probes it. */
  private def editMatchBatch(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    EditSimilarity.editDistanceJoinBetween(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      t = 6, prefixLen = 80)
  }

  private def dedupSimhash(s: SparkSession, d: String): DataFrame =
    TextDedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
      maxHamming = 3)

  /** SimHash certificate: the identical kernel (signatures → pigeonhole
    * bands → bucket pairs → exact Hamming verify) run with the portable
    * md5-prefix word hash, which DuckDB computes bit-identically — so
    * the whole pipeline, hash included, goes under the driver's oracle
    * hash gate. The oracle needs NO banding: LlmSpec proves the banded
    * join ≡ brute-force Hamming filtering, so the all-pairs SQL below is
    * the same relation. */
  private def dedupSimhashMd5(s: SparkSession, d: String): DataFrame =
    TextDedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
      maxHamming = 3, wordHash = TextDedup.md5Hash60)

  private val dedupSimhashMd5Sql: String = {
    val bitSums = (0 until 60).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val sigBits = (0 until 60).map(b =>
      s"CASE WHEN s$b > 0 THEN (1::BIGINT << $b) ELSE 0 END")
      .mkString(" | ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE word <> ''),
       |bits AS (SELECT doc_id, $bitSums FROM w GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sigBits AS simhash FROM bits)
       |SELECT id1, id2, hamming FROM (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |    bit_count(xor(a.simhash, b.simhash)) AS hamming
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id) t
       |WHERE hamming <= 3""".stripMargin
  }

  /** Near-dup clusters: connected components over the verified MinHash
    * pair graph (J >= 0.9). Oracle: DuckDB recursive CTE computing the
    * same component minima over the same exact pair set. */
  private def dedupClusters(s: SparkSession, d: String): DataFrame =
    DedupPipeline.components(
        TextDedup.minhashLsh(Tables.documents(s, d), "doc_id", "text", 0.9))

  /** Quality-canonical dedup ([[DedupPipeline.keepBest]]): per near-dup
    * cluster keep the highest-quality member, not the arbitrary min id —
    * the "which copy survives" policy a production corpus pipeline
    * actually wants. Clusters from the same MinHash-LSH components as
    * dedup_clusters; scores from the same composite as quality_score, so
    * the oracle composes their two proven mirrors. */
  private def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    DedupPipeline.keepBest(
      DedupPipeline.components(
        TextDedup.minhashLsh(docs, "doc_id", "text", 0.9)),
      TextStats.qualityScore(docs, "doc_id", "text"))
      .orderBy(col("rep"))
  }

  private val dedupKeepBestSql: String = {
    val stopArr = TextStats.lexicons.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH RECURSIVE
       |docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM docs)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT p.d1 AS id1, p.d2 AS id2
       |  FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2) p
       |  JOIN sizes s1 ON p.d1 = s1.doc_id
       |  JOIN sizes s2 ON p.d2 = s2.doc_id
       |  WHERE CAST(p.inter AS DOUBLE) / (s1.n + s2.n - p.inter) >= 0.9),
       |edges AS (SELECT id1, id2 FROM pairs
       |          UNION ALL SELECT id2, id1 FROM pairs),
       |nodes AS (SELECT DISTINCT id1 AS id FROM edges),
       |r(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.id2, r.lbl FROM r JOIN edges e ON e.id1 = r.id),
       |clusters AS (SELECT id, min(lbl) AS rep FROM r GROUP BY id),
       |q AS (SELECT id,
       |  CAST(stop AS DOUBLE) / n_tokens * CAST(2.0 AS DOUBLE)
       |    - CAST(n_punct AS DOUBLE) / n_chars * CAST(4.0 AS DOUBLE)
       |    + (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
       |       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS quality
       |  FROM (SELECT doc_id AS id, length(text) AS n_chars,
       |          len(string_split(text, ' ')) AS n_tokens,
       |          len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
       |          len(list_filter(string_split(text, ' '),
       |              w -> list_contains($stopArr, w))) AS stop
       |        FROM documents) t)
       |SELECT rep, keep_id, best_quality, cluster_size FROM (
       |  SELECT c.rep, q.id AS keep_id, q.quality AS best_quality,
       |    count(*) OVER (PARTITION BY c.rep) AS cluster_size,
       |    row_number() OVER (PARTITION BY c.rep
       |                       ORDER BY q.quality DESC, q.id ASC) AS rn
       |  FROM clusters c JOIN q ON c.id = q.id) t
       |WHERE rn = 1 ORDER BY rep""".stripMargin
  }

  private val dedupClustersSql: String =
    s"""WITH RECURSIVE
       |docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM docs)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT p.d1 AS id1, p.d2 AS id2
       |  FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2) p
       |  JOIN sizes s1 ON p.d1 = s1.doc_id
       |  JOIN sizes s2 ON p.d2 = s2.doc_id
       |  WHERE CAST(p.inter AS DOUBLE) / (s1.n + s2.n - p.inter) >= 0.9),
       |edges AS (SELECT id1, id2 FROM pairs
       |          UNION ALL SELECT id2, id1 FROM pairs),
       |nodes AS (SELECT DISTINCT id1 AS id FROM edges),
       |r(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.id2, r.lbl FROM r JOIN edges e ON e.id1 = r.id)
       |SELECT id, min(lbl) AS rep FROM r GROUP BY id ORDER BY id""".stripMargin

  // ---- embeddings ----

  /** DuckDB mirror of [[Embeddings.dot]]: left-to-right list_reduce fold
    * in double precision — bit-identical to Spark's `aggregate`. */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private val sqlNorms: String =
    s"""v AS (SELECT vec_id, embedding,
       |  sqrt(${sqlDot("embedding", "embedding")}) AS nrm FROM embeddings)""".stripMargin

  /** Exact cosine dedup on the 1-Bucket-Theta block layout — equi-join
    * physical plan (no BroadcastNestedLoopJoin; PlanShapeSpec pins it).
    * The all-pairs SQL below is the oracle mirror only. Exact-quadratic
    * is registered deliberately: the testdata's threshold (0.45) sits at
    * the 99.99th pct of a gapless background cosine continuum, where no
    * candidate scheme can be lossless — see Embeddings.cosineDedupBlocked
    * scaladoc for the measured distribution; the gapped-corpus scale path
    * is dedup_embedding_lsh below. */
  private def dedupEmbedding(s: SparkSession, d: String): DataFrame =
    Embeddings.cosineDedupBlocked(Tables.embeddings(s, d), "vec_id", "embedding",
      dim, threshold = 0.45)

  /** Sign-LSH candidates + exact verify at the same threshold: output is
    * a verified SUBSET of dedup_embedding_cosine (precision 1 by
    * construction; recall is corpus-gap-dependent, so rows-only here and
    * recall-pinned on a gapped corpus in LlmSpec). */
  private def dedupEmbeddingLsh(s: SparkSession, d: String): DataFrame =
    Embeddings.cosineDedupLsh(Tables.embeddings(s, d), "vec_id", "embedding",
      dim, threshold = 0.45, bits = 60, bands = 10)

  /** FULL oracle for the sign-LSH dedup (the `knn_ann_lsh` replication
    * pattern): the hyperplanes are the fixed ±1 matrix
    * ([[Embeddings.planeSigns]], splitmix-mixed (bit, component) — ONE
    * definition shared with the Spark signature builder), so DuckDB
    * replays the exact candidate set — 6-bit band buckets over 60 sign
    * bits, bucket-mate pairs, exact double cosine ≥ threshold. The
    * output is deterministic end-to-end; no recall bound needed. */
  private val dedupEmbeddingLshSql: String = {
    val rows = Embeddings.planeSigns(60, dim).zipWithIndex
      .map { case (sgn, b) => s"($b, '$sgn')" }.mkString(",\n  ")
    s"""WITH pl(b, sgn) AS (VALUES
       |  $rows),
       |sig AS (
       |  SELECT e.vec_id AS id, pl.b,
       |    CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}),
       |        i -> CAST(e.embedding[i] AS DOUBLE) *
       |          (CASE WHEN substr(pl.sgn, i, 1) = '+'
       |           THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)),
       |      (x, y) -> x + y) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN pl),
       |bands AS (
       |  SELECT id, b // 6 AS band,
       |    CAST(sum(bit << (b % 6)) AS BIGINT) AS bh
       |  FROM sig GROUP BY id, b // 6),
       |cand AS (
       |  SELECT DISTINCT a.id AS id1, c.id AS id2
       |  FROM bands a JOIN bands c ON a.band = c.band AND a.bh = c.bh
       |  WHERE a.id < c.id),
       |$sqlNorms
       |SELECT id1, id2, cos FROM (
       |  SELECT cand.id1, cand.id2,
       |    ${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
       |  FROM cand JOIN v a ON cand.id1 = a.vec_id
       |            JOIN v b ON cand.id2 = b.vec_id) t
       |WHERE cos >= 0.45
       |ORDER BY id1, id2""".stripMargin
  }

  private val dedupEmbeddingSql: String =
    s"""WITH $sqlNorms
       |SELECT id1, id2, cos FROM (
       |  SELECT a.vec_id AS id1, b.vec_id AS id2,
       |    ${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id) t
       |WHERE cos >= 0.45""".stripMargin

  // ---- BPE training replay (round 14) ----
  // Each word's tokenization rides as a string of delimiter-wrapped
  // tokens — chr(30) t chr(31) per token — so a merge is ONE replace():
  // every token owns both its delimiters, which makes replace()'s
  // leftmost-first non-overlapping scan EXACTLY Bpe.applyMerge (with a
  // shared delimiter, "aaaaa" would group (1,2)(4,5) instead of BPE's
  // (1,2)(3,4)). 24 rounds unroll as chained CTEs: pair counts (exact
  // integers, weighted by word count), argmax under the trainer's total
  // order (n DESC, l, r — ASCII, so UTF-16 and byte order agree), merge
  // applied via scalar subqueries; an early-stopped round (max n < 2)
  // yields an empty m-CTE, replace() of NULL coalesces to the unchanged
  // table, and every later round stays empty — exactly the trainer's
  // `done` flag.
  private val bpeRounds = 24

  private def bpeRoundCtes: String =
    (0 until bpeRounds).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT s[i] AS l, s[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT s, cnt, unnest(range(1, len(s))) AS i FROM (
         |    SELECT string_split(substring(toks, 2, length(toks) - 2),
         |      chr(31) || chr(30)) AS s, cnt FROM w$k))
         |  GROUP BY l, r),
         |m$k AS MATERIALIZED (SELECT l, r FROM p$k WHERE n >= 2
         |        ORDER BY n DESC, l, r LIMIT 1),
         |w${k + 1} AS MATERIALIZED (
         |  SELECT w, cnt, coalesce(replace(toks,
         |    chr(30) || (SELECT l FROM m$k) || chr(31) ||
         |      chr(30) || (SELECT r FROM m$k) || chr(31),
         |    chr(30) || (SELECT l FROM m$k) ||
         |      (SELECT r FROM m$k) || chr(31)), toks) AS toks
         |  FROM w$k)""".stripMargin
    }.mkString(",\n")

  private def bpeBaseCtes: String =
    s"""wc AS MATERIALIZED (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |w0 AS MATERIALIZED (
       |  SELECT w, cnt,
       |    array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> chr(30) || substr(w, i, 1) || chr(31)), '')
       |      || chr(30) || '</w>' || chr(31) AS toks
       |  FROM wc),
       |$bpeRoundCtes""".stripMargin

  // the base CTE block is already margin-stripped — concatenate, never
  // re-stripMargin text containing lines that BEGIN with a `||` concat
  private val bpeMergesSql: String =
    s"WITH $bpeBaseCtes\n" +
      "SELECT * FROM (\n  " +
      (0 until bpeRounds).map(k =>
        s"SELECT CAST($k AS INTEGER) AS rank, l AS \"left\", " +
          s"r AS \"right\" FROM m$k").mkString("\n  UNION ALL\n  ") +
      ")\nORDER BY rank"

  private val bpeTokenFreqSql: String =
    s"WITH $bpeBaseCtes\n" +
      "SELECT t AS token, CAST(sum(cnt) AS BIGINT) AS n FROM (\n" +
      "  SELECT unnest(string_split(substring(toks, 2, length(toks) - 2),\n" +
      s"    chr(31) || chr(30))) AS t, cnt FROM w$bpeRounds)\n" +
      "GROUP BY t ORDER BY n DESC, token"

  private val bpeEncodeSql: String =
    s"WITH $bpeBaseCtes,\n" +
      "wtok AS (\n" +
      "  SELECT w, string_split(substring(toks, 2, length(toks) - 2),\n" +
      s"    chr(31) || chr(30)) AS ts FROM w$bpeRounds),\n" +
      """dw AS (
        |  SELECT doc_id, unnest(ws) AS wd,
        |    unnest(range(1, len(ws) + 1)) AS i
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        |agg AS (
        |  SELECT d.doc_id,
        |    CAST(sum(len(wt.ts)) AS BIGINT) AS n_tokens,
        |    array_to_string(flatten(list(wt.ts ORDER BY d.i))[1:8], ' ')
        |      AS head_tokens
        |  FROM dw d JOIN wtok wt ON d.wd = wt.w
        |  GROUP BY d.doc_id)
        |SELECT doc.doc_id, coalesce(agg.n_tokens, 0) AS n_tokens,
        |  coalesce(agg.head_tokens, '') AS head_tokens
        |FROM documents doc LEFT JOIN agg ON doc.doc_id = agg.doc_id
        |ORDER BY doc.doc_id""".stripMargin

  /** knn_ann_pq replay from the run's own codes + codebooks
    * ([[graft.llm.Pq.lastLits]]): the ADC table (per-query ×
    * per-subspace × per-centroid squared distance — FLOAT diffs and
    * squares, DOUBLE accumulation, all IEEE-identical between DuckDB
    * REAL and the JVM), the per-candidate j-ORDERED distance fold
    * (`list(d ORDER BY j)` + left reduce — SUM() would reassociate),
    * the k·rerank shortlist (adist, nid ties), and the exact Euclidean
    * rerank. */
  private def knnAnnPqSql(): Option[String] =
    graft.llm.Pq.lastLits.map { case (codes, cbooks) =>
      val codeRows = codes.map { case (i, cs) =>
        s"($i, [${cs.mkString(", ")}])" }.mkString(", ")
      val cbRows = cbooks.map { case (j, c, ctr) =>
        s"($j, $c, CAST([${ctr.mkString(", ")}] AS FLOAT[]))"
      }.mkString(",\n  ")
      s"""WITH cb(j, c, center) AS (VALUES
         |  $cbRows),
         |codes(id, code) AS (VALUES $codeRows),
         |$sqlNorms,
         |q AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id < 8),
         |dt AS MATERIALIZED (
         |  SELECT q.vec_id AS qid, cb.j, cb.c,
         |    list_reduce(list_transform(range(1, 5),
         |      t -> CAST((q.embedding[cb.j * 4 + t] - cb.center[t])
         |              * (q.embedding[cb.j * 4 + t] - cb.center[t])
         |            AS DOUBLE)),
         |      (x, y) -> x + y) AS d
         |  FROM q CROSS JOIN cb),
         |cj AS MATERIALIZED (
         |  SELECT id, unnest(code) AS cidx, unnest(range(0, 16)) AS j
         |  FROM codes),
         |adist AS MATERIALIZED (
         |  SELECT dt.qid, cj.id AS nid,
         |    list_reduce(list(dt.d ORDER BY dt.j), (x, y) -> x + y) AS ad
         |  FROM cj JOIN dt ON dt.j = cj.j AND dt.c = cj.cidx
         |  WHERE cj.id <> dt.qid
         |  GROUP BY dt.qid, cj.id),
         |short AS MATERIALIZED (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (
         |      PARTITION BY qid ORDER BY ad, nid) AS srk
         |    FROM adist) s WHERE srk <= 40),
         |scored AS (
         |  SELECT sh.qid AS query_id, sh.nid AS neighbor_id,
         |    (a.nrm * a.nrm + b.nrm * b.nrm
         |      - ${sqlDot("a.embedding", "b.embedding")} * 2.0) AS dist2
         |  FROM short sh JOIN v a ON sh.qid = a.vec_id
         |                JOIN v b ON sh.nid = b.vec_id)
         |SELECT query_id, neighbor_id, rank, dist2 FROM (
         |  SELECT query_id, neighbor_id, dist2,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY dist2, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin
    }

  /** IVF-ADC replay — the composed index: probe-cell ranking from the
    * coarse literals (knnAnnIvfSql's CTEs), candidates restricted to the
    * probed cells' assignment, ADC scoring + shortlist + exact rerank
    * from the PQ literals (knnAnnPqSql's CTEs). */
  private def ivfAdcSql(
      ivf: (Seq[(Long, Int)], Seq[(Int, Seq[Float], Double)]),
      pq: (Seq[(Long, Seq[Int])], Seq[(Int, Int, Seq[Float])])): String = {
    val (asg, cents) = ivf
    val (codes, cbooks) = pq
    val codeRows = codes.map { case (i, cs) =>
      s"($i, [${cs.mkString(", ")}])" }.mkString(", ")
    val cbRows = cbooks.map { case (j, c, ctr) =>
      s"($j, $c, CAST([${ctr.mkString(", ")}] AS FLOAT[]))"
    }.mkString(",\n  ")
    s"""WITH asg(id, cell) AS (VALUES ${ivfAsgValues(asg)}),
       |cent(cell, center, cnorm2) AS (VALUES
       |  ${ivfCentValues(cents)}),
       |cb(j, c, center) AS (VALUES
       |  $cbRows),
       |codes(id, code) AS (VALUES $codeRows),
       |$sqlNorms,
       |q AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id < 8),
       |probed AS MATERIALIZED (
       |  SELECT qid, cell FROM (
       |    SELECT q.vec_id AS qid, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        (q.nrm * q.nrm
       |          - ${sqlDot("q.embedding", "c.center")} * 2.0
       |          + c.cnorm2), c.cell) AS crk
       |    FROM q CROSS JOIN cent c) t
       |  WHERE crk <= 6),
       |cand AS MATERIALIZED (
       |  SELECT p.qid, s.id AS nid
       |  FROM probed p JOIN asg s ON s.cell = p.cell
       |  WHERE s.id <> p.qid),
       |dt AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, cb.j, cb.c,
       |    list_reduce(list_transform(range(1, 5),
       |      t -> CAST((q.embedding[cb.j * 4 + t] - cb.center[t])
       |              * (q.embedding[cb.j * 4 + t] - cb.center[t])
       |            AS DOUBLE)),
       |      (x, y) -> x + y) AS d
       |  FROM q CROSS JOIN cb),
       |cj AS MATERIALIZED (
       |  SELECT id, unnest(code) AS cidx, unnest(range(0, 16)) AS j
       |  FROM codes),
       |adist AS MATERIALIZED (
       |  SELECT c.qid, c.nid,
       |    list_reduce(list(dt.d ORDER BY dt.j), (x, y) -> x + y) AS ad
       |  FROM cand c JOIN cj ON cj.id = c.nid
       |              JOIN dt ON dt.qid = c.qid AND dt.j = cj.j
       |                     AND dt.c = cj.cidx
       |  GROUP BY c.qid, c.nid),
       |short AS MATERIALIZED (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (
       |      PARTITION BY qid ORDER BY ad, nid) AS srk
       |    FROM adist) s WHERE srk <= 40),
       |scored AS (
       |  SELECT sh.qid AS query_id, sh.nid AS neighbor_id,
       |    (a.nrm * a.nrm + b.nrm * b.nrm
       |      - ${sqlDot("a.embedding", "b.embedding")} * 2.0) AS dist2
       |  FROM short sh JOIN v a ON sh.qid = a.vec_id
       |                JOIN v b ON sh.nid = b.vec_id)
       |SELECT query_id, neighbor_id, rank, dist2 FROM (
       |  SELECT query_id, neighbor_id, dist2,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY dist2, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  private def knnAnnIvfPqSql(): Option[String] =
    for (ivf <- graft.llm.Ivf.lastLits; pq <- graft.llm.Pq.lastLits)
      yield ivfAdcSql(ivf, pq)

  private def knnAnnIvfPqDiskSql(): Option[String] =
    graft.llm.Pq.lastDiskLits.map { case (ivf, pq) => ivfAdcSql(ivf, pq) }

  // ---- run-derived IVF oracles (round 14) ----
  // Built from Ivf.lastLits, populated when a registry query builds the
  // cached index; None before any run (the rows-only fallback), Some at
  // Verify's post-run oracle dump. See the Ivf.lastLits scaladoc.

  private def ivfAsgValues(asg: Seq[(Long, Int)]): String =
    asg.map { case (i, c) => s"($i, $c)" }.mkString(", ")

  private def ivfCentValues(cents: Seq[(Int, Seq[Float], Double)]): String =
    cents.map { case (c, arr, n2) =>
      // Float literals CAST to FLOAT[] first (shortest-repr decimal →
      // nearest float == the original); cnorm2 rides as the exact double
      // Spark broadcast (Double.toString round-trips)
      s"($c, CAST([${arr.mkString(", ")}] AS FLOAT[]), " +
        s"CAST('$n2' AS DOUBLE))"
    }.mkString(",\n  ")

  private def dedupSemanticSql(): Option[String] =
    graft.llm.Ivf.lastLits.map { case (asg, _) =>
      s"""WITH asg(id, cell) AS (VALUES ${ivfAsgValues(asg)}),
         |$sqlNorms,
         |a AS (SELECT v.vec_id AS id, v.embedding, v.nrm, asg.cell
         |      FROM v JOIN asg ON v.vec_id = asg.id)
         |SELECT id1, id2, cos FROM (
         |  SELECT x.id AS id1, y.id AS id2,
         |    ${sqlDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
         |  FROM a x JOIN a y ON x.cell = y.cell AND x.id < y.id) t
         |WHERE cos >= 0.45""".stripMargin
    }

  private def knnAnnIvfSql(): Option[String] =
    graft.llm.Ivf.lastLits.map(ivfProbeSql)

  /** Same replay for the DISK-backed probe, from the literals of the
    * LOADED artifact (which may predate this process). */
  private def knnAnnIvfDiskSql(): Option[String] =
    graft.llm.Ivf.lastDiskLits.map(ivfProbeSql)

  private def ivfProbeSql(
      lits: (Seq[(Long, Int)], Seq[(Int, Seq[Float], Double)])): String =
    lits match { case (asg, cents) =>
      s"""WITH asg(id, cell) AS (VALUES ${ivfAsgValues(asg)}),
         |cent(cell, center, cnorm2) AS (VALUES
         |  ${ivfCentValues(cents)}),
         |$sqlNorms,
         |q AS (SELECT vec_id, embedding, nrm FROM v WHERE vec_id < 8),
         |probed AS (
         |  SELECT qid, cell FROM (
         |    SELECT q.vec_id AS qid, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        (q.nrm * q.nrm
         |          - ${sqlDot("q.embedding", "c.center")} * 2.0
         |          + c.cnorm2), c.cell) AS crk
         |    FROM q CROSS JOIN cent c) t
         |  WHERE crk <= 6),
         |cand AS (
         |  SELECT p.qid, s.id AS nid
         |  FROM probed p JOIN asg s ON s.cell = p.cell
         |  WHERE s.id <> p.qid),
         |scored AS (
         |  SELECT cand.qid AS query_id, cand.nid AS neighbor_id,
         |    ${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM cand JOIN v a ON cand.qid = a.vec_id
         |            JOIN v b ON cand.nid = b.vec_id)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin
    }

  /** Cluster-balanced sampling ([[Embeddings.clusterBalancedSample]]):
    * the SemDeDup-style diversity cap — nearest-of-k-anchors cosine
    * assignment, then a deterministic hash-priority cap per cluster, so
    * no semantic region dominates the sample. Exact-oracle-able because
    * the anchors are fixed (k smallest ids), the cosine arithmetic is
    * the bit-identical left-to-right double fold, and the priority is
    * pure integer math. */
  private def clusterSample(s: SparkSession, d: String): DataFrame =
    Embeddings.clusterBalancedSample(Tables.embeddings(s, d), "vec_id",
      "embedding", dim, k = 8, perCluster = 12)

  private val clusterSampleSql: String =
    s"""WITH $sqlNorms,
       |a AS (SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
       |      FROM v WHERE nrm > 0 ORDER BY vec_id LIMIT 8),
       |scored AS (
       |  SELECT v.vec_id AS id, a.cid,
       |    ${sqlDot("v.embedding", "a.cvec")} / (v.nrm * a.cnrm) AS cos
       |  FROM v CROSS JOIN a),
       |best AS (SELECT id, cid AS cluster FROM (
       |    SELECT id, cid, row_number() OVER (
       |      PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
       |    FROM scored) t WHERE rn = 1),
       |pri AS (SELECT cluster, id,
       |          ((id % 1000000007) * 2654435761) % 1000000007 AS pri FROM best)
       |SELECT cluster, id AS vec_id, samp_rank FROM (
       |  SELECT cluster, id, CAST(row_number() OVER (
       |    PARTITION BY cluster ORDER BY pri DESC, id ASC) AS INT) AS samp_rank
       |  FROM pri) t
       |WHERE samp_rank <= 12""".stripMargin

  private def knnBrute(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Embeddings.bruteForceKnn(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", dim, k = 5)
  }

  private val knnBruteSql: String =
    s"""WITH $sqlNorms,
       |scored AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    ${sqlDot("q.embedding", "v.embedding")} / (q.nrm * v.nrm) AS cos
       |  FROM v q JOIN v ON q.vec_id < 8 AND v.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, rank, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin

  private def knnAnnLsh(s: SparkSession, d: String): DataFrame =
    Embeddings.annLshKnn(Tables.embeddings(s, d), queryIds = (0L until 8L),
      "vec_id", "embedding", dim, k = 5)

  /** Full oracle for [[knnAnnLsh]]: the approximation is DETERMINISTIC
    * given the fixed ±1 hyperplanes, so the ORACLE REPLICATES THE
    * CANDIDATE SET itself — signature bits from the same plane rows
    * (inlined as literals from [[Embeddings.planeSigns]], the one shared
    * definition), 4-bit band buckets, bucket-mate candidates for the 8
    * query ids, exact cosine, top-5 — instead of comparing against
    * brute force through a recall bound. Every float→double product and
    * the left-to-right fold mirror `graft_dot` bit-for-bit (the same
    * contract the knn_bruteforce oracle already proves). */
  private val knnAnnLshSql: String = {
    val rows = Embeddings.planeSigns(64, dim).zipWithIndex
      .map { case (sgn, b) => s"($b, '$sgn')" }.mkString(",\n  ")
    s"""WITH pl(b, sgn) AS (VALUES
       |  $rows),
       |sig AS (
       |  SELECT e.vec_id AS id, pl.b,
       |    CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}),
       |        i -> CAST(e.embedding[i] AS DOUBLE) *
       |          (CASE WHEN substr(pl.sgn, i, 1) = '+'
       |           THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)),
       |      (x, y) -> x + y) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN pl),
       |bands AS (
       |  SELECT id, b // 4 AS band,
       |    CAST(sum(bit << (b % 4)) AS BIGINT) AS bh
       |  FROM sig GROUP BY id, b // 4),
       |cand AS (
       |  SELECT DISTINCT q.id AS qid, c.id AS nid
       |  FROM bands q JOIN bands c ON q.band = c.band AND q.bh = c.bh
       |  WHERE q.id < 8 AND c.id <> q.id),
       |$sqlNorms,
       |scored AS (
       |  SELECT cand.qid AS query_id, cand.nid AS neighbor_id,
       |    ${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
       |  FROM cand JOIN v a ON cand.qid = a.vec_id
       |            JOIN v b ON cand.nid = b.vec_id)
       |SELECT query_id, neighbor_id, rank, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  /** Exhaustive-setting IVF: nprobe == nlist probes every cell, and the
    * cells PARTITION the corpus, so the search space is the full corpus
    * and the per-pair cosine is the same expression as brute force —
    * the result must be bit-identical to [[knnBrute]]. IvfSpec proves
    * this in-suite; registering it with the brute-force oracle makes the
    * DRIVER certify the IVF kernel (build, cell routing, probe-side
    * scoring, bounded TopK) too. The pruned nprobe < nlist config stays
    * rows-only as the genuinely-approximate production setting. */
  private def knnAnnIvfExh(s: SparkSession, d: String): DataFrame =
    graft.llm.Ivf.annKnn(Tables.embeddings(s, d), (0L until 8L),
      "vec_id", "embedding", dim, k = 5, nlist = 16, nprobe = 16,
      corpusKey = d) // shares the cached index with knn_ann_ivf

  /** Exhaustive-setting PQ: k·rerank = 2000 ≥ corpus−1 at every test SF,
    * so the ADC shortlist is every non-self vector regardless of code
    * quantization and the exact Euclidean rerank IS the whole answer —
    * the ADC stage can reorder but never drop a true neighbor. Output is
    * exact squared-Euclidean top-k, SQL-expressible, certifying the PQ
    * encode/ADC/rerank pipeline through the driver. The pruned rerank=8
    * config stays rows-only as the production setting. */
  private def knnAnnPqExh(s: SparkSession, d: String): DataFrame =
    graft.llm.Pq.annKnn(Tables.embeddings(s, d), (0L until 8L),
      "vec_id", "embedding", dim, k = 5, m = 16, ksub = 16,
      rerank = 400, corpusKey = d) // shares the cached codes with knn_ann_pq

  /** Driver-certified retrieval QUALITY for the pruned ANN variants —
    * the rows-only knn_ann_* configs have their recall pinned only in
    * specs; this row makes it a driver-checkable certificate. For each
    * production (pruned) configuration, recall hits = |ANN top-5 ∩
    * exact top-5| summed over the 8 query ids (exact integer counting;
    * the exact side is the same kernel family's oracle-green exhaustive
    * path: cosine brute force for ivf/lsh, exhaustive-rerank PQ — i.e.
    * exact Euclidean — for pq/ivfpq). The output pins `hits >=
    * floor_hits` as DATA, so a quality regression in any pruned kernel
    * flips `floor_met` and fails the driver's hash gate; the floors are
    * the spec-tier bounds (LlmSpec/IvfSpec/PqSpec assert the same or
    * tighter per run), sitting well under measured hits (sf0.001:
    * ivf 30 / lsh 36 / pq 32 / ivfpq 26 of 40; sf0.01: 31/37/34/30).
    * The raw hit count itself is configuration- and SF-dependent,
    * hence not part of the certified schema. Floors tightened in round
    10 toward the measured band (r9 advice #7): a regression now has at
    most ~6 hits of slack before the driver flags it. */
  private def knnRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val ids = (0L until 8L)
    def pairs(df: DataFrame) = df.select(col("query_id"), col("neighbor_id"))
    // the six kernels are independent and each pays bounded driver
    // collects (query set, centroids, codebooks) plus index loads —
    // construct them CONCURRENTLY so those small jobs overlap instead of
    // queueing (guide §2.6; IndexStore.ensure is per-path locked, so
    // kernels sharing an index serialize only on its build). The
    // assembled plan and its result are unchanged.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val (exactCos, exactL2, ivf, lsh, pq, ivfpq) = try {
      val fs = (
        Future(pairs(knnBrute(s, d))),
        Future(pairs(knnAnnPqExh(s, d))),
        Future(pairs(graft.llm.Ivf.annKnn(emb, ids, "vec_id", "embedding",
          dim, k = 5, nlist = 16, nprobe = 6, corpusKey = d))),
        Future(pairs(knnAnnLsh(s, d))),
        Future(pairs(graft.llm.Pq.annKnn(emb, ids, "vec_id", "embedding",
          dim, k = 5, m = 16, ksub = 16, corpusKey = d))),
        Future(pairs(graft.llm.Pq.ivfAdcKnn(emb, ids, "vec_id", "embedding",
          dim, k = 5, nlist = 16, nprobe = 6, m = 16, ksub = 16,
          corpusKey = d))))
      (Await.result(fs._1, Duration.Inf), Await.result(fs._2, Duration.Inf),
        Await.result(fs._3, Duration.Inf), Await.result(fs._4, Duration.Inf),
        Await.result(fs._5, Duration.Inf), Await.result(fs._6, Duration.Inf))
    } finally pool.shutdown()
    val variants: Seq[(String, DataFrame, DataFrame, Int)] = Seq(
      ("ivf", ivf, exactCos, 24),
      ("lsh", lsh, exactCos, 32),
      ("pq", pq, exactL2, 28),
      ("ivfpq", ivfpq, exactL2, 20))
    variants.map { case (name, ann, exact, floor) =>
      ann.join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("variant"), lit(5).as("k"),
          lit(8).as("n_queries"), lit(floor).as("floor_hits"),
          (col("hits") >= floor).as("floor_met"))
    }.reduce(_ unionByName _).orderBy(col("variant"))
  }

  private val knnRecallSql: String =
    """SELECT * FROM (VALUES
      |  ('ivf', 5, 8, 24, true), ('ivfpq', 5, 8, 20, true),
      |  ('lsh', 5, 8, 32, true), ('pq', 5, 8, 28, true))
      |  AS t(variant, k, n_queries, floor_hits, floor_met)
      |ORDER BY variant""".stripMargin

  /** Euclidean-distance mirror of [[knnBruteSql]] for the exhaustive PQ
    * path: dist2 = |q|² + |v|² − 2⟨q,v⟩ in the exact expression order the
    * Spark rerank uses, ties broken by neighbor id on both sides. */
  private val knnPqExhSql: String =
    s"""WITH $sqlNorms,
       |scored AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    q.nrm * q.nrm + v.nrm * v.nrm
       |      - ${sqlDot("q.embedding", "v.embedding")} * 2.0 AS dist2
       |  FROM v q JOIN v ON q.vec_id < 8 AND v.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, rank, dist2 FROM (
       |  SELECT query_id, neighbor_id, dist2,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY dist2, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin

  /** Hybrid retrieval: reciprocal-rank fusion of the dense arm (exact
    * cosine top-20 over embeddings) and the sparse arm (exact 3-gram
    * Jaccard top-20 over the document texts) for queries 0–7 — the
    * testdata's `vec_id` and `doc_id` spaces are both 0..n-1 over the
    * same synthetic corpus, so the two systems rank the same id space.
    * Integer ranks + fixed-order IEEE divisions make the fused score
    * bit-exact, so the full fusion pipeline is oracle-checked
    * ([[graft.llm.Ranking.rrfFuse]]). */
  private def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val dense = Embeddings.bruteForceKnn(Tables.embeddings(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") < 8),
        "vec_id", "embedding", dim, k = 20)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val sparse = graft.llm.Ranking.jaccardTopK(Tables.documents(s, d),
        Tables.documents(s, d).filter(col("doc_id") < 8),
        "doc_id", "text", k = 20)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    graft.llm.Ranking.rrfFuse(Seq(dense, sparse), c = 60, k = 10)
  }

  private val hybridRrfSql: String =
    s"""WITH $sqlNorms,
       |dense AS (SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |          ${sqlDot("q.embedding", "v.embedding")} / (q.nrm * v.nrm) AS cos
       |        FROM v q JOIN v ON q.vec_id < 8 AND v.vec_id <> q.vec_id) s) t
       |  WHERE rank <= 20),
       |docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM docs)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS qid, b.doc_id AS did, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < 8 AND b.doc_id <> a.doc_id
       |  GROUP BY 1, 2),
       |sparse AS (SELECT qid, did, rank FROM (
       |  SELECT qid, did, row_number() OVER (PARTITION BY qid
       |      ORDER BY CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) DESC, did)
       |    AS rank
       |  FROM inter JOIN sizes s1 ON qid = s1.doc_id
       |             JOIN sizes s2 ON did = s2.doc_id) t
       |  WHERE rank <= 20),
       |fused AS (SELECT
       |    coalesce(d.query_id, s.qid) AS query_id,
       |    coalesce(d.neighbor_id, s.did) AS neighbor_id,
       |    coalesce(CAST(1.0 AS DOUBLE) / (60 + d.rank), CAST(0.0 AS DOUBLE))
       |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + s.rank), CAST(0.0 AS DOUBLE))
       |      AS rrf
       |  FROM dense d FULL OUTER JOIN sparse s
       |    ON d.query_id = s.qid AND d.neighbor_id = s.did)
       |SELECT query_id, neighbor_id, rank, rrf FROM (
       |  SELECT query_id, neighbor_id, rrf,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY rrf DESC, neighbor_id) AS rank
       |  FROM fused) t
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- text analysis ----

  private def langId(s: SparkSession, d: String): DataFrame =
    TextStats.langId(Tables.documents(s, d), "doc_id", "text")

  private val langIdSql: String = {
    val scores = TextStats.lexicons.map { case (l, lex) =>
      val arr = lex.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(string_split(text, ' '), w -> list_contains($arr, w))) AS score_$l"
    }.mkString(",\n  ")
    val langs = TextStats.lexicons.map(_._1)
    val arms = langs.dropRight(1).map { l =>
      val cond = langs.map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("\n    ")
    s"""SELECT id, ${langs.map(l => s"score_$l").mkString(", ")},
       |  CASE $arms ELSE '${langs.last}' END AS pred_lang
       |FROM (SELECT doc_id AS id, $scores FROM documents) t
       |ORDER BY id""".stripMargin
  }

  private def tokenCount(s: SparkSession, d: String): DataFrame =
    TextStats.tokenCounts(Tables.documents(s, d), "doc_id", "text")

  private def quality(s: SparkSession, d: String): DataFrame =
    TextStats.qualityScore(Tables.documents(s, d), "doc_id", "text")

  private def compressionRatio(s: SparkSession, d: String): DataFrame =
    TextStats.compressionStats(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("id"))

  private val qualitySql: String = {
    val stopArr = TextStats.lexicons.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT id, n_chars, n_tokens,
       |  CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
       |  CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
       |  CAST(stop AS DOUBLE) / n_tokens AS stopword_ratio,
       |  CAST(stop AS DOUBLE) / n_tokens * CAST(2.0 AS DOUBLE)
       |    - CAST(n_punct AS DOUBLE) / n_chars * CAST(4.0 AS DOUBLE)
       |    + (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
       |       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS quality
       |FROM (SELECT doc_id AS id, length(text) AS n_chars,
       |        len(string_split(text, ' ')) AS n_tokens,
       |        len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
       |        len(list_filter(string_split(text, ' '),
       |            w -> list_contains($stopArr, w))) AS stop
       |      FROM documents) t
       |ORDER BY id""".stripMargin
  }

  // ---- multimodal ----

  /** Binary-column decode plumbing over a synthesized payload (text bytes
    * as the opaque media blob): typed mapPartitions with the stubbed
    * codec. Deterministic, so oracle-checkable byte-for-byte. */
  private def multimodalDecode(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.documents(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload")),
      "doc_id", "payload", "image")
    Multimodal.decodeMeta(media).toDF()
  }

  private val multimodalDecodeSql: String =
    """SELECT doc_id AS media_id, 'image' AS kind,
      |  ord(substr(text, 1, 1)) * 256 + ord(substr(text, 2, 1)) AS width,
      |  ord(substr(text, 3, 1)) * 256 + ord(substr(text, 4, 1)) AS height,
      |  'image/fake' AS format, length(text) AS n_bytes
      |FROM documents ORDER BY media_id""".stripMargin

  /** Stub featurizer → fixed-dim float vectors (shape contract for the
    * ANN kernels); rows-only, content asserted in MultimodalSpec. */
  private def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.documents(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload")),
      "doc_id", "payload", "image")
    // flattened to scalar rows: array columns break pandas-side row
    // sorting in the driver's compare harness
    Multimodal.featurize(media, dim = 16).toDF()
      .select(col("media_id"), posexplode(col("feature")).as(Seq("dim_idx", "value")))
      .orderBy(col("media_id"), col("dim_idx"))
  }

  /** Exact-integer certificate twin of [[multimodalFeatures]]
    * (`llm/Multimodal.byteBlockStats`): the same block boundaries over
    * the same binary payloads, outputs integer (sum, len, milli-mean)
    * instead of the float mean — oracle-checked, so the distributed
    * byte-blocking is driver-certified while the float twin stays
    * rows-only (same pattern as knn_ann_ivf_exh). */
  private def multimodalFeaturesBlocks(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.documents(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload")),
      "doc_id", "payload", "image")
    Multimodal.byteBlockStats(media, dim = 16)
      .orderBy(col("media_id"), col("dim_idx"))
  }

  private val multimodalFeaturesBlocksSql: String =
    """WITH d AS (SELECT doc_id AS id, text, length(text) AS n FROM documents),
      |b AS (SELECT id, text, n, unnest(range(0, 16)) AS i FROM d),
      |blk AS (SELECT id, CAST(i AS BIGINT) AS dim_idx,
      |    (i * n) // 16 AS lo, ((i + 1) * n) // 16 AS hi, text FROM b),
      |s AS (SELECT id, dim_idx,
      |    CAST(coalesce(list_sum(list_transform(range(lo + 1, hi + 1),
      |        j -> ord(substr(text, CAST(j AS INTEGER), 1)))), 0) AS BIGINT)
      |      AS block_sum,
      |    CAST(hi - lo AS BIGINT) AS block_len
      |  FROM blk)
      |SELECT id AS media_id, dim_idx, block_sum, block_len,
      |  CASE WHEN block_len = 0 THEN CAST(0 AS BIGINT)
      |       ELSE (1000 * block_sum) // block_len END AS value_milli
      |FROM s ORDER BY media_id, dim_idx""".stripMargin

  /** REAL codec roundtrip, oracle-checked: per doc, render a constant-
    * gray image (dims and gray level derived arithmetically from the
    * id), PNG-encode it, decode the pixels back, then area-average
    * resize by 2 and decode again — all through the JDK ImageIO codec
    * ([[Multimodal.JvmImageCodec]]). Every output column is the DECODED
    * value, so a codec regression breaks the hash; DuckDB only has to
    * reproduce the arithmetic (PNG is lossless, area-average of a
    * constant image is that constant). */
  private def multimodalPixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val w = (id % 13 + 2).toInt; val h = (id % 7 + 2).toInt
      val g = (id % 251).toInt
      val png = Multimodal.JvmImageCodec.encodePng(
        w, h, Array.fill(w * h)((g << 16) | (g << 8) | g))
      val (dw, dh, rgb) = Multimodal.JvmImageCodec.decodeRgb(png).get
      val small = Multimodal.JvmImageCodec.resizePng(png, 2).get
      val (rw, rh, rrgb) = Multimodal.JvmImageCodec.decodeRgb(small).get
      (id, dw, dh, dw * dh, rgb(0) & 0xff, rw, rh, rrgb(0) & 0xff)
    }.toDF("media_id", "width", "height", "n_pixels", "gray",
           "r_width", "r_height", "r_gray")
  }

  private val multimodalPixelsSql: String =
    """SELECT doc_id AS media_id,
      |  (doc_id % 13 + 2) AS width, (doc_id % 7 + 2) AS height,
      |  (doc_id % 13 + 2) * (doc_id % 7 + 2) AS n_pixels,
      |  (doc_id % 251) AS gray,
      |  (doc_id % 13 + 2) // 2 AS r_width, (doc_id % 7 + 2) // 2 AS r_height,
      |  (doc_id % 251) AS r_gray
      |FROM documents ORDER BY media_id""".stripMargin

  // no orderBy: the driver's compare sorts rows anyway, and a global
  // sort's range-partition sampling pass would compute the fingerprint
  // expression twice
  private def docFingerprint(s: SparkSession, d: String): DataFrame =
    TextStats.fingerprint(Tables.documents(s, d), "doc_id", "text")

  /** Incremental ingest: the odd-doc_id batch dedups against the
    * even-doc_id corpus through its persisted band index — the corpus is
    * never re-signatured. The verified output is exact Jaccard, so the
    * oracle is the same all-pairs relation as dedup_minhash_lsh
    * restricted to pairs touching the batch. */
  private def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    // the FULL disk lifecycle, oracle-checked: the band index is written
    // once (crash-safe completion marker, content-fingerprinted path) and
    // every ingest — including a cold session's first — probes the
    // parquet relation, never an in-session rebuild
    val dir = graft.llm.IndexStore.indexDir(s, "mhband_even", s"$d/documents.parquet")
    graft.llm.IndexStore.ensure(s, dir) {
      TextDedup.saveBandIndex(
        TextDedup.minhashBandIndex(corpus, "doc_id", "text"), s"$dir/bands")
    }
    val index = TextDedup.loadBandIndex(s, s"$dir/bands")
    TextDedup.incrementalMinhashLsh(batch, corpus, index, "doc_id", "text",
      threshold = 0.8)
  }

  def all: Seq[Q] = Seq(
    Q("dedup_exact", dedupExact,
      Some("""SELECT md5(lower(text)) AS digest, min(doc_id) AS keep_id,
             |  count(*) AS copies
             |FROM documents GROUP BY 1""".stripMargin)),
    Q("dedup_minhash_lsh", dedupMinhash, Some(jaccardOracle(0.8))),
    Q("dedup_incremental", dedupIncremental,
      Some(s"""SELECT * FROM (${jaccardOracle(0.8)}) q
              |WHERE id1 % 2 = 1 OR id2 % 2 = 1""".stripMargin)),
    Q("dedup_ngram_jaccard", dedupNgram, Some(jaccardOracle(0.5))),
    Q("dedup_edit_distance", dedupEditDistance,
      // the length band (|Δl| > t ⇒ dist > t) keeps the brute-force
      // oracle cheap; the Spark side never does all-pairs at all
      Some("""SELECT a.doc_id AS id1, b.doc_id AS id2,
             |  levenshtein(substr(a.text,1,80), substr(b.text,1,80)) AS dist
             |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
             |WHERE abs(length(substr(a.text,1,80)) - length(substr(b.text,1,80))) <= 6
             |  AND levenshtein(substr(a.text,1,80), substr(b.text,1,80)) <= 6""".stripMargin)),
    Q("edit_match_batch", editMatchBatch,
      Some("""SELECT a.doc_id AS probe_id, b.doc_id AS ref_id,
             |  levenshtein(substr(a.text,1,80), substr(b.text,1,80)) AS dist
             |FROM documents a JOIN documents b
             |  ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
             |WHERE abs(length(substr(a.text,1,80)) - length(substr(b.text,1,80))) <= 6
             |  AND levenshtein(substr(a.text,1,80), substr(b.text,1,80)) <= 6""".stripMargin)),
    // Cross-source record linkage (`llm/EntityResolution.scala`): a
    // perturbed copy of customer (one digit deleted from each name,
    // keys offset) linked back to the original — nation-blocked join,
    // banded native levenshtein, per-record argmin with a total
    // (dist, a_id) tie-break so the ambiguous all-digits name space
    // resolves identically in both engines.
    Q("entity_resolution", (s, d) => {
      import org.apache.spark.sql.functions._
      val c = Tables.customer(s, d)
      val a = c.select(col("c_custkey").as("a_id"), col("c_name").as("a_name"),
        col("c_nationkey").as("nat"))
      val b = c.select((col("c_custkey") + 1000000L).as("b_id"),
        expr("concat(substring(c_name, 1, cast(c_custkey % 9 + 9 as int)), " +
             "substring(c_name, cast(c_custkey % 9 + 11 as int), 18))").as("b_name"),
        col("c_nationkey").as("nat"))
      graft.llm.EntityResolution.linkBestPruned(a, b, Seq("nat"),
          "a_id", "b_id", "a_name", "b_name", maxDist = 1)
        .select(col("b_id"), col("a_id"), col("dist"))
        .orderBy(col("b_id"))
    },
      Some("""WITH a AS (
             |  SELECT c_custkey AS a_id, c_name AS a_name, c_nationkey AS nat
             |  FROM customer),
             |b AS (
             |  SELECT c_custkey + 1000000 AS b_id,
             |    concat(substring(c_name, 1, CAST(c_custkey % 9 + 9 AS INT)),
             |           substring(c_name, CAST(c_custkey % 9 + 11 AS INT), 18)) AS b_name,
             |    c_nationkey AS nat
             |  FROM customer),
             |cand AS (
             |  SELECT b_id, a_id, levenshtein(a_name, b_name) AS dist
             |  FROM b JOIN a USING (nat)
             |  WHERE abs(length(a_name) - length(b_name)) <= 1
             |    AND levenshtein(a_name, b_name) <= 1)
             |SELECT b_id, a_id, dist FROM (
             |  SELECT b_id, a_id, dist,
             |    row_number() OVER (PARTITION BY b_id ORDER BY dist, a_id) AS rn
             |  FROM cand) t
             |WHERE rn = 1 ORDER BY b_id""".stripMargin)),
    Q("dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    Q("dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    Q("dedup_simhash", dedupSimhash, None), // xxhash64 has no oracle-engine
                                            // mirror — LlmSpec properties
    Q("dedup_simhash_md5", dedupSimhashMd5, Some(dedupSimhashMd5Sql)),
    Q("dedup_embedding_cosine", dedupEmbedding, Some(dedupEmbeddingSql)),
    Q("cluster_sample", clusterSample, Some(clusterSampleSql)),
    // FULL oracle since round 13: the fixed hyperplane matrix replays in
    // SQL (knn_ann_lsh pattern), so the candidate set — and with it the
    // whole output — is deterministic, not just subset-of-exact
    Q("dedup_embedding_lsh", dedupEmbeddingLsh, Some(dedupEmbeddingLshSql)),
    Q("dedup_semantic", (s, d) => graft.llm.Embeddings.semanticDedup(
      Tables.embeddings(s, d), "vec_id", "embedding", dim, threshold = 0.45,
      nlist = 16, corpusKey = d), // shares the cached IVF build with knn_ann_ivf
      // FULL oracle since round 14: the run's cell ASSIGNMENT is inlined
      // as literals (Ivf.lastLits — registry re-evaluates at Verify's
      // post-run dump), and everything downstream — within-cell pair
      // generation, the exact cosine fold, the threshold — replays
      // bit-exactly in DuckDB. The quantizer's own training stays
      // certified by SemDedupSpec (subset-of-exact; exact restricted to
      // co-clustered ids) + the driver-hashed knn_ann_ivf_exh row.
      dedupSemanticSql()),

    Q("knn_bruteforce", knnBrute, Some(knnBruteSql)),
    Q("hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    Q("knn_ann_lsh", knnAnnLsh, Some(knnAnnLshSql)),
    Q("knn_ann_ivf", (s, d) => graft.llm.Ivf.annKnn(Tables.embeddings(s, d),
      (0L until 8L), "vec_id", "embedding", dim, k = 5, nlist = 16, nprobe = 6,
      corpusKey = d), // index cached per corpus — repeat calls are probe-only
      // FULL oracle since round 14: assignment + centroid literals from
      // the run's own index (Ivf.lastLits), probe-cell ranking by the
      // same ||q−c||² expression (nrm·nrm − 2·dot + cnorm2, identical
      // association), candidates from the inlined assignment, cosine +
      // (cos DESC, id) top-k tie order — all bit-exact in DuckDB. The
      // genuinely non-SQL piece (MLlib's training) is certified by the
      // exhaustive twin knn_ann_ivf_exh == brute force under the same
      // driver hash gate.
      knnAnnIvfSql()),
    // driver-checked certificates for the ANN kernels: exhaustive
    // settings are ≡ exact search, so the full build+probe machinery
    // runs under the oracle hash gate (see each def's scaladoc)
    Q("knn_ann_ivf_exh", knnAnnIvfExh, Some(knnBruteSql)),
    Q("knn_ann_pq_exh", knnAnnPqExh, Some(knnPqExhSql)),
    Q("knn_ann_ivf_disk", (s, d) => graft.llm.Ivf.annKnnFromDisk(
      Tables.embeddings(s, d), s"$d/embeddings.parquet", (0L until 8L),
      "vec_id", "embedding", dim, k = 5, nlist = 16, nprobe = 6),
      // build+save once (marker-gated), answer from a COLD load with the
      // probed cells as PARTITION filters on the saved layout. FULL
      // oracle since round 14: the LOADED artifact's assignment +
      // centroids replay the probe in DuckDB (knn_ann_ivf's pattern,
      // from lastDiskLits); disk≡memory + PartitionFilters stay in IvfSpec
      knnAnnIvfDiskSql()),
    Q("knn_ann_pq", (s, d) => graft.llm.Pq.annKnn(Tables.embeddings(s, d),
      (0L until 8L), "vec_id", "embedding", dim, k = 5, m = 16, ksub = 16,
      corpusKey = d), // codebooks+codes cached per corpus, 16x compression
      // FULL oracle since round 14: the run's codes + codebooks replay
      // the ADC shortlist and exact rerank bit-exactly in DuckDB (see
      // knnAnnPqSql); code shape/round-trip/recall stay in PqSpec
      knnAnnPqSql()),
    Q("knn_ann_ivfpq", (s, d) => graft.llm.Pq.ivfAdcKnn(Tables.embeddings(s, d),
      (0L until 8L), "vec_id", "embedding", dim, k = 5, nlist = 16, nprobe = 6,
      m = 16, ksub = 16, corpusKey = d), // cell pruning × code compression
      // FULL oracle since round 14: composed replay — coarse probe from
      // the IVF literals, ADC + rerank from the PQ literals (ivfAdcSql);
      // nprobe==nlist ≡ plain PQ stays pinned in PqSpec
      knnAnnIvfPqSql()),
    Q("knn_ann_ivfpq_disk", (s, d) => graft.llm.Pq.ivfAdcKnnDisk(
      Tables.embeddings(s, d), s"$d/embeddings.parquet", (0L until 8L),
      "vec_id", "embedding", dim, k = 5, nlist = 16, nprobe = 6),
      // the durable composed artifact: cell-partitioned 16×-compressed
      // codes + codebooks + coarse layout, probed cold with the cells as
      // partition filters. FULL oracle since round 14 from the LOADED
      // artifact's own literals (Pq.lastDiskLits); disk≡memory +
      // PartitionFilters stay pinned in PqSpec
      knnAnnIvfPqDiskSql()),
    // retrieval-quality certificate: recall floors of the four pruned
    // configs above, as driver-checked data (see knnRecall's scaladoc)
    Q("knn_recall", knnRecall, Some(knnRecallSql)),
    Q("lang_id", langId, Some(langIdSql)),
    Q("token_count", tokenCount,
      Some("""SELECT doc_id AS id, len(string_split(text, ' ')) AS n_ws_tokens,
             |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens,
             |  length(text) AS n_chars
             |FROM documents ORDER BY id""".stripMargin)),
    Q("quality_score", quality, Some(qualitySql)),
    Q("compression_ratio", compressionRatio,
      None), // deflate has no oracle-engine mirror (no zlib in ANSI SQL /
             // DuckDB); CompressionStatsSpec pins byte-count exactness vs
             // a driver-side deflate, partitioning invariance, and the
             // repetitive-vs-diverse ordering

    Q("multimodal_decode", multimodalDecode, Some(multimodalDecodeSql)),
    Q("multimodal_features", multimodalFeatures, None), // shape: MultimodalSpec
    Q("multimodal_features_blocks", multimodalFeaturesBlocks,
      Some(multimodalFeaturesBlocksSql)),
    Q("multimodal_pixels", multimodalPixels, Some(multimodalPixelsSql)),
    Q("doc_fingerprint", docFingerprint,
      Some("""SELECT doc_id AS id,
             |  list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
             |    i -> md5(substr(text, i, 8)))) AS fp
             |FROM documents ORDER BY id""".stripMargin)),

    // FULL oracles since round 14: the whole BPE training loop REPLAYS
    // in DuckDB — 24 unrolled rounds of (weighted pair count → argmax
    // with the same total tie order → left-to-right non-overlapping
    // merge), each word's tokenization carried as a delimiter-wrapped
    // string where replace() reproduces applyMerge exactly (every token
    // owns BOTH its delimiters, so consecutive merges never share a
    // boundary and the leftmost-first grouping matches). Counts are
    // exact integers; symbols are ASCII. BpeSpec keeps pinning the
    // distributed == local == sequential-reference equality and
    // corpus-wide decode losslessness.
    Q("bpe_merges", (s, d) => graft.llm.Bpe.mergesDf(s,
      graft.llm.Bpe.trainMerges(Tables.documents(s, d), "text", nMerges = 24)),
      Some(bpeMergesSql)),
    // the ORACLE-CHECKED kernel under the trainer: step-0 weighted
    // adjacent-pair counts (char symbols + the </w> marker) — exact
    // integers, so the corpus-sized half of BPE training runs under the
    // driver's hash gate even though the iterated argmax cannot
    Q("bpe_pair_counts", (s, d) =>
      graft.llm.Bpe.pairCounts(Tables.documents(s, d), "text"),
      Some("""WITH wc AS (
             |  SELECT w, count(*) AS cnt FROM (
             |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |  WHERE length(w) > 0 GROUP BY w),
             |syms AS (
             |  SELECT list_append(list_transform(range(1, length(w) + 1),
             |    i -> substr(w, i, 1)), '</w>') AS s, cnt FROM wc),
             |pairs AS (
             |  SELECT s[i] AS l, s[i + 1] AS r, cnt
             |  FROM (SELECT s, cnt, unnest(range(1, len(s))) AS i FROM syms))
             |SELECT l, r, CAST(sum(cnt) AS BIGINT) AS n
             |FROM pairs GROUP BY l, r ORDER BY l, r""".stripMargin)),
    // FULL oracle since round 14: token frequencies = the replayed
    // round-24 tokenization's token counts. The greedy lowest-rank
    // encoder reproduces the training-table segmentation on corpus
    // words (a merge's parts can only be built by EARLIER merges, so
    // rank order == training order on this corpus — BpeSpec pins the
    // token-mass equality that would catch any divergence).
    Q("bpe_token_freq", (s, d) => graft.llm.Bpe.tokenFrequencies(
      Tables.documents(s, d), "text",
      graft.llm.Bpe.trainMerges(Tables.documents(s, d), "text", nMerges = 24)),
      Some(bpeTokenFreqSql)),
    // Corpus tokenization under the learned ranks — the encode step a
    // training pipeline runs after [[Bpe.trainMerges]]. FULL oracle
    // since round 14: per-document tokens re-assemble from the replayed
    // word tokenization in word order (same greedy≡training-order
    // argument as bpe_token_freq); BpeSpec keeps decode(encode(doc)) ==
    // doc corpus-wide and Σ n_tokens == Σ tokenFrequencies.n.
    Q("bpe_encode", (s, d) => {
      import org.apache.spark.sql.functions._
      graft.llm.Bpe.encodeDocuments(
          Tables.documents(s, d), "doc_id", "text",
          graft.llm.Bpe.trainMerges(Tables.documents(s, d), "text", nMerges = 24))
        .select(col("doc_id"), col("n_tokens"),
          concat_ws(" ", slice(col("tokens"), 1, 8)).as("head_tokens"))
        .orderBy(col("doc_id"))
    }, Some(bpeEncodeSql)),
  )
}
