package graft.ops

import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Property-based invariants (SURVEY.md §5 test plan): SortValidator-style
  * total-sort checks, aggregate merge associativity (salted == plain),
  * dedup conservation — on ScalaCheck-generated data with fixed seeds
  * (deterministic; no scalatestplus bridge in the offline cache, so
  * sampling is driven manually). */
class PropertySpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(42L + i)))

  private val kvGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(-50L, 50L), Gen.choose(-1000L, 1000L)))

  test("total sort: output is ordered AND a permutation of the input (SortValidator)") {
    import spark.implicits._
    for (data <- samples(kvGen, 5)) {
      val out = data.toDF("k", "v").orderBy($"k", $"v")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.sameElements(data.sorted))
    }
  }

  test("salted two-phase agg == plain agg for arbitrary key/value data") {
    import spark.implicits._
    for (data <- samples(kvGen, 5)) {
      val df = data.toDF("k", "v")
      val salted = Skew.saltedAgg(df, Seq("k"), buckets = 4,
          ("sum", "v", "sv"), ("count", "v", "n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val plain = df.groupBy($"k").agg(sum($"v").as("sv"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain)
    }
  }

  test("exact dedup: identical rows collapse, sum of copies preserved") {
    import spark.implicits._
    val textGen = Gen.nonEmptyListOf(Gen.oneOf("aa bb", "cc dd", "ee ff", "gg hh"))
    for (texts <- samples(textGen, 5)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val res = graft.llm.TextDedup.exact(df, "doc_id", "text").collect()
      assert(res.length == texts.distinct.length)
      assert(res.map(_.getLong(2)).sum == texts.length)
    }
  }

  test("verifyJaccard == verifyJaccardDirect on any candidate set") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"), (1L, "a b c d e g"), (2L, "x y z w q r"),
      (3L, "a b c x y z"), (4L, "f e d c b a")).toDF("doc_id", "text")
    val sh = graft.llm.TextDedup.shingles(docs, "doc_id", "text", n = 2)
    val cands = Seq((0L, 1L), (0L, 2L), (1L, 4L), (2L, 3L), (0L, 4L))
      .toDF("id1", "id2")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(norm(graft.llm.TextDedup.verifyJaccard(cands, sh)) ==
           norm(graft.llm.TextDedup.verifyJaccardDirect(cands, sh)))
  }
}
