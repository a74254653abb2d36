package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** Hand-computed invariants for the C4-style line ops and the bigram LM
  * (the registry covers the corpus-scale oracle compare; these pin exact
  * semantics on tiny inputs where the answer is checkable by hand). */
class LineOpsSpec extends SparkTestBase {

  test("toLines: non-overlapping spans cover the doc exactly") {
    import spark.implicits._
    val d = Seq((1L, (1 to 19).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val lines = LineOps.toLines(d, "doc_id", "text", 8).orderBy("line_idx").collect()
    assert(lines.map(_.getAs[String]("line")) sameElements Array(
      (1 to 8).map(i => s"w$i").mkString(" "),
      (9 to 16).map(i => s"w$i").mkString(" "),
      "w17 w18 w19"))
  }

  test("firstOccurrence: smallest (id, line_idx) wins, independent of partitioning") {
    import spark.implicits._
    val lines = Seq(
      (2L, 0L, "dup line"), (1L, 5L, "dup line"), (1L, 2L, "dup line"),
      (3L, 0L, "unique")).toDF("id", "line_idx", "line")
    val r = LineOps.firstOccurrence(lines.repartition(7))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getAs[Boolean]("is_first")).toMap
    assert(r((1L, 2L)) && !r((1L, 5L)) && !r((2L, 0L)) && r((3L, 0L)))
  }

  test("dedupSpans: repeats removed, order preserved, empty docs dropped") {
    import spark.implicits._
    val lines = Seq(
      (1L, 0L, "aa"), (1L, 1L, "bb"),
      (2L, 0L, "bb"), (2L, 1L, "cc"), // bb is a repeat of doc 1's
      (3L, 0L, "aa"), (3L, 1L, "bb")  // fully duplicate doc -> dropped
    ).toDF("id", "line_idx", "line")
    val r = LineOps.dedupSpans(lines).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("n_kept"), x.getAs[String]("text"))).toMap
    assert(r(1L) == (2L, "aa bb"))
    assert(r(2L) == (1L, "cc"))
    assert(!r.contains(3L))
  }

  test("hot-line stress: one line in every doc, dedup stays correct") {
    import spark.implicits._
    // 20k docs all sharing a boilerplate line (the cookie-banner case):
    // the first-occurrence agg must partial-combine, not buffer the hot
    // group, and exactly one occurrence survives corpus-wide
    val n = 20000L
    val lines = spark.range(n).select(col("id"),
        explode(array(lit(0L), lit(1L))).as("line_idx"))
      .select(col("id"), col("line_idx"),
        when(col("line_idx") === 0, lit("accept all cookies to continue"))
          .otherwise(concat(lit("unique payload "), col("id"))).as("line"))
    val r = LineOps.dedupSpans(lines)
    assert(r.count() == n) // every doc retains its unique line
    val hotSurvivors = LineOps.firstOccurrence(lines)
      .filter(col("line") === "accept all cookies to continue" && col("is_first"))
      .collect()
    assert(hotSurvivors.length == 1 &&
      hotSurvivors.head.getAs[Long]("id") == 0L &&
      hotSurvivors.head.getAs[Long]("line_idx") == 0L)
    // doc 0 keeps both lines; every other doc lost the boilerplate
    val kept = r.filter(col("id") === 0).collect().head
    assert(kept.getAs[Long]("n_kept") == 2)
    assert(r.filter(col("n_kept") =!= 1).count() == 1)
  }

  test("c4 line+doc filter: punctuation, min words, banned substrings") {
    import spark.implicits._
    val lines = Seq(
      // doc 1: 3 good lines -> keep
      (1L, 0L, "one two three four five."), (1L, 1L, "a b c d e!"),
      (1L, 2L, "p q r s t?"),
      // doc 2: only 2 good (one unterminated, one too short) -> drop
      (2L, 0L, "one two three four five."), (2L, 1L, "no terminal punct here"),
      (2L, 2L, "short one."), (2L, 3L, "x y z w v."),
      // doc 3: banned substring -> drop despite 3 good lines
      (3L, 0L, "one two three four five."), (3L, 1L, "a b c d javascript!"),
      (3L, 2L, "p q r s t?")
    ).toDF("id", "line_idx", "line")
    val r = LineOps.docFilter(LineOps.lineFilter(lines, minWords = 5), minLines = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(r(1L).getAs[String]("text") == "one two three four five. a b c d e! p q r s t?")
    assert(!r(2L).getAs[Boolean]("keep") && r(2L).getAs[Long]("n_kept") == 2)
    assert(!r(3L).getAs[Boolean]("keep") && r(3L).getAs[Boolean]("has_banned"))
  }

  test("bigram LM: hand-computed perplexity, seen and held-out") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a")).toDF("doc_id", "text")
    // model: bigrams (<s>,a),(a,b),(b,a) each 1; contexts <s>,a,b each 1; V=3
    val self = LangModel.perplexityExact(corpus, corpus, "doc_id", "text").collect()(0)
    assert(self.getAs[Long]("n_bigrams") == 3)
    // each p = 1.5/2.5 = 0.6
    assert(math.abs(self.getAs[Double]("perplexity") - 1.0 / 0.6) < 1e-12)
    val held = Seq((9L, "c c")).toDF("doc_id", "text")
    val h = LangModel.perplexity(held, corpus, "doc_id", "text").collect()(0)
    // p(<s>,c)=0.5/2.5=0.2 (unseen bigram, seen ctx); p(c,c)=0.5/1.5 (unseen ctx)
    assert(math.abs(h.getAs[Double]("sum_nll") - math.log(15.0)) < 1e-12)
    assert(math.abs(h.getAs[Double]("perplexity") - math.sqrt(15.0)) < 1e-12)
  }

  test("perplexityExact is bit-identical across repartitionings") {
    val docs = Tables.documents(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) =
      LangModel.perplexityExact(df, df, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Double]("sum_nll"), r.getAs[Double]("perplexity"))).toMap
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a == b) // exact double equality — the fold order is pinned
  }
}
