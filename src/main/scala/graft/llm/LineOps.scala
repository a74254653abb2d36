package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line/span-level corpus operations in the C4 style (Raffel et al. 2020,
  * "Exploring the Limits of Transfer Learning" §2.2 — public paper):
  * corpus-global duplicate-span removal and line+document cleaning
  * filters, plus document reassembly from the surviving lines.
  *
  * Operates on an exploded lines frame `(id, line_idx, line)` so the same
  * kernels serve any line notion (newline split, sentence split,
  * fixed-word spans). At 100 TB the shape is: one shuffle keyed by the
  * line CONTENT for the global first-occurrence aggregation (map-side
  * partial min, so each executor sends one candidate per distinct local
  * line, not one per occurrence), one hash join back to the occurrences,
  * and one shuffle on doc id to reassemble — no windows over the whole
  * corpus, no driver-side state.
  */
object LineOps {

  /** Explode docs into non-overlapping `n`-word lines: (id, line_idx,
    * line). Delegates to [[Packing.chunk]] with stride = size. */
  def toLines(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Packing.chunk(docs, idCol, textCol, size = n, stride = n)
      .select(col("id"), col("chunk_idx").as("line_idx"),
        col("chunk_text").as("line"))

  /** Mark the corpus-global first occurrence of every distinct line.
    * "First" = smallest (id, line_idx) lexicographically — a pure
    * function of the data, independent of partitioning, so reruns and
    * retries keep the same occurrence (same reason the samplers hash
    * instead of rand()). Adds `is_first`.
    *
    * groupBy(line) + min(struct) rather than a window over the line
    * partition: the aggregation partial-combines map-side and never
    * sorts within groups, which matters when one hot line (boilerplate,
    * cookie banner) has a billion occurrences. */
  def firstOccurrence(lines: DataFrame): DataFrame = {
    val keeper = lines.groupBy(col("line").as("k_line"))
      .agg(min(struct(col("id"), col("line_idx"))).as("keep"))
    lines.join(keeper, col("line") === col("k_line"))
      .withColumn("is_first",
        col("id") === col("keep.id") && col("line_idx") === col("keep.line_idx"))
      .drop("k_line", "keep")
  }

  /** C4-style duplicate-span removal + reassembly: every line keeps only
    * its globally first occurrence; documents are rebuilt from their
    * surviving lines in original order. Docs whose every line was a
    * repeat disappear (C4 drops empty docs). Output: (id, n_lines,
    * n_kept, text) with `text` the deduplicated document. */
  def dedupSpans(lines: DataFrame, sep: String = " "): DataFrame =
    firstOccurrence(lines)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("is_first"),
              struct(col("line_idx"), col("line"))))),
            x => x.getField("line")),
          sep).as("text"))
      .filter(col("n_kept") > 0)

  /** C4 line filter: a line survives iff it ends in terminal punctuation
    * and has at least `minWords` words. Adds `line_keep`. */
  def lineFilter(lines: DataFrame, minWords: Int = 5): DataFrame =
    lines.withColumn("line_keep",
      col("line").rlike("[.!?\"]$") &&
        size(split(col("line"), " ")) >= minWords)

  /** Per-document duplicated-span fraction (the Lee et al. 2021
    * "Deduplicating Training Data" metric, suffix-array-free — public
    * paper): of a doc's distinct word n-gram windows, the fraction that
    * also occur in at least one OTHER document. High fraction =
    * boilerplate-heavy or near-copied doc; feeds the same keep/weight
    * machinery as the quality filters.
    *
    * Two corpus-keyed aggregations (gram df with map-side combine, then
    * the per-doc count) and one shuffle join gram->df; state is one row
    * per distinct gram. The cross-doc test is df minus the doc's own
    * contribution — dfs come from distinct per-doc grams, so "occurs
    * elsewhere" is exactly df >= 2. */
  def duplicatedSpanFraction(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 8): DataFrame = {
    val grams = TextDedup.shingles(docs, idCol, textCol, n)
    // hash gate (same as SpanTrim): shingles are per-doc DISTINCT, so a
    // gram is duplicated iff its (id, gram) rows span >= 2 docs — decided
    // first over 24-byte hash rows (min != max of doc ids), with gram
    // STRINGS shuffling only for the surviving candidates, then verified
    // exactly on the strings (a hash collision can only ADD a candidate
    // the verify rejects). On a low-duplication corpus the string
    // shuffle is O(duplicated grams), not O(corpus).
    val hashed = grams.withColumn("h", xxhash64(col("shingle")))
    val dupH = hashed.groupBy(col("h"))
      .agg(min(col("id")).as("__lo"), max(col("id")).as("__hi"))
      .filter(col("__lo") =!= col("__hi"))
      .select(col("h"))
    val cand = hashed.join(dupH, "h")
    val dupGrams = cand.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df")).filter(col("df") >= 2)
      .select(col("shingle"))
    val nG = grams.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val nDup = cand.join(dupGrams, "shingle")
      .groupBy(col("id")).agg(count(lit(1)).as("n_dup_grams"))
    val per = nG.join(nDup, Seq("id"), "left_outer")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
      .withColumn("dup_fraction",
        col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
    // docs too short for any n-gram surface with zero counts
    docs.select(col(idCol).as("id")).join(per, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_fraction"), lit(0.0)).as("dup_fraction"))
  }

  /** Benchmark decontamination (the PaLM/GPT-3 appendix-style n-gram
    * overlap check — public papers): count, per corpus document, how
    * many of its distinct word n-grams also occur in any benchmark
    * document; a doc with >= `minShared` shared grams is contaminated
    * and must be dropped from training data.
    *
    * Scale shape: the benchmark gram set is tiny relative to the corpus
    * (eval suites are MBs, corpora are TBs) — Catalyst broadcasts it, so
    * the corpus is scanned once, probed map-side, and the per-doc count
    * partial-aggregates; the corpus is never shuffled on gram content.
    * Output: (id, n_shared_grams, contaminated) for every corpus doc. */
  def contamination(docs: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8, minShared: Int = 1): DataFrame = {
    val docGrams = TextDedup.shingles(docs, idCol, textCol, n)
    val benchGrams = TextDedup.shingles(bench, idCol, textCol, n)
      .select(col("shingle").as("b_shingle")).distinct()
    val shared = docGrams
      .join(broadcast(benchGrams), col("shingle") === col("b_shingle"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared_grams"))
    docs.select(col(idCol).as("id"))
      .join(shared, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") >= minShared)
  }

  /** FUZZY benchmark decontamination: exact n-gram JACCARD between each
    * corpus document and each benchmark document, flagging docs whose
    * best benchmark similarity reaches `minJaccard` — the near-verbatim
    * rewrite case (reworded eval answers, shuffled sentences) that the
    * shared-gram COUNT in [[contamination]] (the GPT-3-style overlap
    * check, Brown et al. 2020 App. C) treats the same as one incidental
    * phrase. Both checks run in practice: count for verbatim leakage,
    * Jaccard for paraphrase-level leakage.
    *
    * Scale shape, same as [[contamination]]: the benchmark gram relation
    * is eval-suite-sized, so it broadcasts; the corpus is scanned once
    * and probed map-side, the per-(doc, bench) intersection counts
    * partial-aggregate, and only gram-sharing pairs ever materialize (no
    * all-pairs product). Benchmark sizes re-broadcast for the Jaccard
    * denominator. Output per corpus doc: (id, n_matched_bench,
    * max_jaccard, contaminated) — the jaccard is a single IEEE division
    * over exact longs, bit-stable cross-engine. */
  def fuzzyContamination(docs: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int = 3,
                         minJaccard: Double = 0.5): DataFrame = {
    val docGrams = TextDedup.shingles(docs, idCol, textCol, n)
    val benchGrams = TextDedup.shingles(bench, idCol, textCol, n)
      .select(col("id").as("b_id"), col("shingle"))
    val docSizes = docGrams.groupBy(col("id")).agg(count(lit(1)).as("na"))
    val benchSizes = benchGrams.groupBy(col("b_id")).agg(count(lit(1)).as("nb"))
    val matches = docGrams
      .join(broadcast(benchGrams), "shingle")
      .groupBy(col("id"), col("b_id")).agg(count(lit(1)).as("inter"))
      .join(docSizes, "id")
      .join(broadcast(benchSizes), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
    val per = matches.groupBy(col("id"))
      .agg(count(lit(1)).as("n_matched_bench"),
        max(col("jaccard")).as("max_jaccard"))
    docs.select(col(idCol).as("id"))
      .join(per, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_matched_bench"), lit(0L)).as("n_matched_bench"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"))
      .withColumn("contaminated", col("n_matched_bench") >= 1)
  }

  /** C4 document filter over filtered lines: a document survives iff it
    * retains at least `minLines` surviving lines and contains none of the
    * `banned` substrings (C4 uses "lorem ipsum", "javascript", "{").
    * Output per doc: (id, n_lines, n_kept, has_banned, keep, text) with
    * `text` the cleaned document (surviving lines only, joined by
    * `sep`). One shuffle (the per-doc aggregation); the banned-substring
    * probe is a per-line codegen'd expression, OR-folded into the agg. */
  def docFilter(filteredLines: DataFrame, minLines: Int = 3,
                banned: Seq[String] = Seq("lorem ipsum", "javascript", "{"),
                sep: String = " "): DataFrame = {
    val lineBanned = banned
      .map(b => contains(lower(col("line")), lit(b)))
      .reduce(_ || _)
    filteredLines
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("line_keep"), 1L).otherwise(0L)).as("n_kept"),
        max(lineBanned).as("has_banned"),
        array_join(
          transform(
            array_sort(collect_list(when(col("line_keep"),
              struct(col("line_idx"), col("line"))))),
            x => x.getField("line")),
          sep).as("text"))
      .withColumn("keep", col("n_kept") >= minLines && !col("has_banned"))
  }
}
