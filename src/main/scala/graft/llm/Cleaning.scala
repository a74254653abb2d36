package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus cleaning for training-data pipelines: PII redaction and
  * Gopher-style repetition/quality statistics (Rae et al. 2021,
  * "Scaling Language Models" §A1.1 repetition filters — public paper).
  *
  * Everything here is a per-row codegen'd column expression (no UDFs),
  * so at 100 TB these run as map-only passes fused into the scan with
  * full whole-stage codegen; the only shuffle in this file is the
  * per-(doc,word) partial-aggregated count behind `top_word_frac`.
  *
  * Regexes are restricted to the syntax subset Java regex and RE2
  * (DuckDB) interpret identically — no backrefs, no lookaround — so the
  * DuckDB oracle mirrors bit-for-bit.
  */
object Cleaning {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails, then phone numbers, then IPv4 addresses (fixed order
    * — a phone-like fragment inside an email must count once, as the
    * email). Counts are measured on the pre-redaction text for each
    * pattern as it becomes visible in the fixed order. */
  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, lit(emailRe), lit("<EMAIL>"))
    val t2 = regexp_replace(t1, lit(phoneRe), lit("<PHONE>"))
    val t3 = regexp_replace(t2, lit(ipRe), lit("<IP>"))
    docs.select(col(idCol).as("id"),
      regexp_count(t0, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(t1, lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(t2, lit(ipRe)).cast("long").as("n_ips"),
      t3.as("redacted"))
  }

  /** Gopher-style repetition statistics + keep flag.
    *
    * - dup_word_frac: fraction of word occurrences that are repeats of an
    *   earlier word in the doc (1 - distinct/total).
    * - top_word_frac: occurrences of the most frequent word / total.
    * - mean_word_len: sum of word lengths / word count (text is
    *   single-space separated, so the sum is chars - (words - 1)).
    * - keep: all three inside the Gopher-ish acceptance band.
    *
    * Ratios are single IEEE divisions of exact integers; the keep flag
    * compares those exact doubles — both mirror bit-exactly in DuckDB.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("id"),
      size(w).cast("long").as("n_words"),
      size(array_distinct(w)).cast("long").as("n_distinct_words"),
      length(col(textCol)).cast("long").as("n_chars"))
    // most-frequent-word count: explode -> per-(doc,word) count -> per-doc
    // max. Both aggregations partial-aggregate map-side, so the shuffle
    // carries one row per distinct (doc,word), never one per token.
    val top = docs.select(col(idCol).as("id"), explode(w).as("wd"))
      .groupBy(col("id"), col("wd")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(max(col("c")).as("top_word_count"))
    base.join(top, "id")
      .withColumn("dup_word_frac",
        (col("n_words") - col("n_distinct_words")).cast("double")
          / col("n_words").cast("double"))
      .withColumn("top_word_frac",
        col("top_word_count").cast("double") / col("n_words").cast("double"))
      .withColumn("mean_word_len",
        (col("n_chars") - (col("n_words") - lit(1L))).cast("double")
          / col("n_words").cast("double"))
      .withColumn("keep",
        col("dup_word_frac") <= lit(0.3) && col("top_word_frac") <= lit(0.2)
          && col("mean_word_len") >= lit(3.0) && col("mean_word_len") <= lit(10.0))
  }
}
