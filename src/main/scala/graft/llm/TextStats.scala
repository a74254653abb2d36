package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting (north-star surface,
  * SURVEY.md §7.1 `engine.llm`). All pure column expressions — codegen'd,
  * pushdown-friendly, no UDFs — and every output is derived from integer
  * counts by single IEEE operations so the DuckDB oracle matches
  * bit-exactly.
  */
object TextStats {

  /** Tiny per-language marker lexicons for the n-gram/stopword-vote
    * language heuristic. Deterministic CASE-chain tiebreak (priority =
    * declaration order). */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "mit", "ein"),
    "es" -> Seq("el", "la", "de", "y", "los", "que", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"),
  )

  private def words(textCol: String): Column = split(col(textCol), " ")

  /** Marker-hit count for one lexicon: |words ∩ lexicon| counting
    * multiplicity (a stopword-frequency vote, not set overlap). */
  private def hits(textCol: String, lex: Seq[String]): Column = {
    val arr = lex.map(w => s"'$w'").mkString("array(", ", ", ")")
    expr(s"size(filter(split($textCol, ' '), w -> array_contains($arr, w)))")
  }

  /** Language-ID: per-language marker votes + argmax with declaration-
    * order tiebreak. Output: (id, lang guesses + scores). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = docs.select(
      col(idCol).as("id") +:
      lexicons.map { case (l, lex) => hits(textCol, lex).as(s"score_$l") }: _*)
    val pred = lexicons.foldRight(lit(lexicons.last._1)) { case ((l, _), rest) =>
      val isMax = lexicons.map(o => col(s"score_$l") >= col(s"score_${o._1}"))
        .reduce(_ && _)
      when(isMax, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs | digit runs | single punctuation). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("n_ws_tokens"),
      regexp_count(col(textCol), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))
        .cast("long").as("n_bpe_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Quality features + score. All ratios are a single double division of
    * integer counts; the composite score is a fixed-order linear combine —
    * bit-exact across engines. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stop = hits(textCol, lexicons.head._2)
    val nTok = size(split(col(textCol), " ")).cast("long")
    val nChar = length(col(textCol)).cast("long")
    val nPunct = regexp_count(col(textCol), lit("[^a-zA-Z0-9 ]")).cast("long")
    docs.select(col(idCol).as("id"), nChar.as("n_chars"), nTok.as("n_tokens"),
        (nChar * lit(1.0) / nTok).as("avg_token_len"),
        (nPunct * lit(1.0) / nChar).as("punct_ratio"),
        (stop.cast("long") * lit(1.0) / nTok).as("stopword_ratio"))
      .withColumn("quality",
        col("stopword_ratio") * lit(2.0)
          - col("punct_ratio") * lit(4.0)
          + when(col("n_tokens") >= 20 && col("n_tokens") <= 1000, lit(1.0))
              .otherwise(lit(0.0)))
  }

  /** Compression-ratio quality signal: deflate(level 6, RFC 1951) size
    * over raw UTF-8 size per document. Template/boilerplate text
    * compresses far better than natural prose, so the ratio is a cheap
    * diversity / quality feature (low ratio → repetitive,
    * machine-generated, or listing-like content) used by public
    * corpus-filtering recipes (e.g. the Gopher data-quality analyses,
    * Rae et al. 2021) alongside [[qualityScore]]'s surface ratios.
    *
    * This is the one TextStats op that can't be a Column expression —
    * deflate is genuinely computational — so it runs as a typed
    * `mapPartitions` with ONE `Deflater` reused per partition (the
    * native-allocation cost amortizes over the partition; per-row
    * allocation would dominate at 100 TB) and released on task
    * completion. Deterministic for fixed input bytes and level, but not
    * ANSI-SQL-expressible (no zlib in the oracle engine) — registered
    * rows-only; CompressionStatsSpec pins byte-count exactness against a
    * driver-side deflate, partitioning invariance, and the
    * repetitive-vs-diverse ordering. */
  def compressionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw =
            if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed,
            if (raw.length == 0) 1.0 else compressed.toDouble / raw.length)
        }
      }
      .toDF("id", "n_bytes", "n_deflate", "ratio")
  }

  /** Rolling-hash document fingerprint (winnowing-lite): the minimum
    * digest over all character k-grams — stable under content moves,
    * sensitive to content edits. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 8): DataFrame = {
    // winnowing-style min-gram digest via the codegen'd graft_mingram
    // expression: one compiled loop per row, map-only, fused into the
    // scan. Replaces an explode that materialized (id, i, text) per
    // character position (|text|-fold row blowup copying the full text)
    // plus a groupBy(min) shuffle; an array_min(transform(...)) fold was
    // tried in between and was even slower — HOF lambdas evaluate
    // interpreted, one md5 hex alloc per window.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"),
      expr(s"graft_mingram($textCol, $k)").as("fp"))
  }
}
