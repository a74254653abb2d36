package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring span TRIMMING: find every maximal run of token
  * positions covered by a `width`-token gram that also occurs in at
  * least `minDocs` distinct documents, and cut those runs out of the
  * text — the positional form of cross-document exact-substring
  * deduplication (the published suffix-array recipe's effect, expressed
  * relationally: every duplicated span of >= width tokens is a union of
  * overlapping duplicated width-grams, so covering-gram positions merged
  * into islands reproduce the maximal spans without building a suffix
  * array). [[LineOps.duplicatedSpanFraction]] MEASURES per-doc
  * duplication; this operator performs the edit and returns the
  * trimmed text.
  *
  * Pipeline shape (all relational, no driver state):
  *  1. tokens: one row-local `posexplode(split(text))` — no shuffle;
  *  2. grams: row-local `slice` over the carried token array (no
  *     per-doc window, so gram construction adds NO shuffle);
  *  3. HASH GATE: the only corpus-wide pass shuffles `xxhash64(gram)`
  *     key rows — `groupBy(h).agg(min(id), max(id))`, 24 bytes each,
  *     map-side combined to one row per distinct hash per partition —
  *     and keeps hashes with `min(id) != max(id)` (seen in ≥2 distinct
  *     docs: EXACT at the gate's threshold, a superset of any
  *     `minDocs` ≥ 2, and never a false negative);
  *  4. duplicated grams: the exact `countDistinct(id) >= minDocs`
  *     verify runs over gate SURVIVORS only, so the wide (doc, pos,
  *     gram-string) rows shuffle only for candidate grams — O(candidate
  *     text), not O(corpus) (the survivor relation is usually small
  *     enough that AQE broadcasts it; hash collisions just add a
  *     candidate the verify rejects);
  *  5. covered positions: occurrences of duplicated grams exploded to
  *     the `width` positions they cover, `distinct` per (doc, pos);
  *  6. islands: per-doc `row_number` staircase (`pos - rank` constant
  *     within a maximal run) — state is per-document, never global;
  *  7. trimmed text: kept tokens re-assembled in position order, for
  *     AFFECTED docs only (a doc with no duplicated span never ships
  *     its tokens through the reassembly shuffle).
  *
  * Why the gate is an exact min/max hash pass and NOT a Count-Min
  * sketch ([[graft.ops.FreqCounts]]): distinguishing "occurs in ≥ 2
  * docs" from "unique" with CM needs the average counter load N/w ≪ 1,
  * i.e. w ≳ the number of DISTINCT grams — at corpus scale that sketch
  * does not fit, and an undersized one passes everything (the gate
  * silently turns off). CM is the right tool for HIGH thresholds
  * (heavy hitters, `freq_sketch`); at threshold 2 the exact 24-byte
  * key-row pass is both smaller on the wire and precise. Everything
  * downstream of step 4 touches only rows of DUPLICATED grams —
  * O(duplicated text), not O(corpus).
  */
object SpanTrim {

  /** Per-document trim report for documents with at least one duplicated
    * span: (id, n_spans, tokens_removed, trimmed_text), ordered by id.
    * Tokenization is single-space split, matching the corpus's other
    * gram operators. */
  def trimDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          width: Int = 8, minDocs: Int = 2): DataFrame = {
    require(width >= 2, "width must be at least 2")
    // the min/max hash gate (step 3) keeps only grams seen in >= 2
    // DISTINCT docs, so a single-doc gram never reaches the exact
    // countDistinct verify — the pass is exact only for minDocs >= 2
    // (minDocs = 1 would mean "trim every span", a different operator)
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs): the " +
      "hash gate is exact only above the seen-twice threshold")
    val id = col(idCol)
    val base = docs.select(id.as("id"), split(col(textCol), " ").as("arr"))
    val toks = base
      .select(col("id"), col("arr"), size(col("arr")).as("n_tokens"))
      .select(col("id"), col("arr"), col("n_tokens"),
        posexplode(col("arr")).as(Seq("pos", "tok")))
    // grams are row-local slices of the carried array. Tradeoff, MEASURED
    // at sf0.1: this shape keeps concat_ws(slice(...)) inside whole-stage
    // codegen (1.7 s); the alternative that materializes all grams once
    // per document via transform(sequence(...), ...) avoids the Generate
    // operator's O(tokens²)-byte array carry but pays interpreted
    // higher-order-function eval — 8.1 s on the same corpus, 4.7× slower.
    // The quadratic carry only bites on very long documents; the corpus
    // contract for those is to chunk first (doc_chunks), which bounds
    // tokens-per-row and keeps this the faster plan at every scale.
    val valid = toks
      .filter(col("pos") + width <= col("n_tokens"))
      .select(col("id"), col("pos"),
        concat_ws(" ", slice(col("arr"), col("pos") + 1, lit(width))).as("g"))
    // hash gate (step 3): 24-byte key rows decide which gram hashes can
    // possibly satisfy minDocs >= 2; gram STRINGS shuffle only for the
    // survivors. min != max over doc ids is exact "seen in >= 2 docs".
    val hashed = valid.withColumn("h", xxhash64(col("g")))
    val dupH = hashed.groupBy(col("h"))
      .agg(min(col("id")).as("__lo"), max(col("id")).as("__hi"))
      .filter(col("__lo") =!= col("__hi"))
      .select(col("h"))
    val cand = hashed.join(dupH, "h").select(col("id"), col("pos"), col("g"))
    val dup = cand.groupBy(col("g"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("g"))
    val cov = cand.join(dup, "g")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (width - 1))).as("cpos"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cpos"))
    val isl = cov.withColumn("grpk", col("cpos") - row_number().over(w))
    val agg = isl.groupBy(col("id"))
      .agg(countDistinct(col("grpk")).as("n_spans"),
        count(lit(1)).as("tokens_removed"))
    val covA = cov.toDF("cid", "cpos")
    // reassembly touches AFFECTED docs only — an untouched doc's tokens
    // never enter the collect_list shuffle
    val affected = cov.select(col("id")).distinct()
    val kept = toks.select(col("id"), col("pos"), col("tok"))
      .join(affected.toDF("aid"), col("id") === col("aid"), "left_semi")
      .join(covA, col("id") === col("cid") && col("pos") === col("cpos"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("trimmed_text"))
    agg.join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_spans"), col("tokens_removed"),
        coalesce(col("trimmed_text"), lit("")).as("trimmed_text"))
      .orderBy(col(idCol))
  }
}
