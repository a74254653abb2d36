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

  test("RangeJoin equals the naive theta join on random intervals") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(0L, 500L)),                     // points
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 480L), Gen.choose(1L, 90L))))
    for (((ps, ivs), i) <- samples(gen, 4).zipWithIndex) {
      val points = ps.zipWithIndex.map { case (p, j) => (j.toLong, p) }.toDF("pid", "p")
      val intervals = ivs.zipWithIndex.map { case ((lo, w), j) => (j.toLong, lo, lo + w) }
        .toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
          bucketWidth = 64)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (p, j) <- ps.zipWithIndex
        ((lo, w), k) <- ivs.zipWithIndex
        if p >= lo && p < lo + w
      } yield (j.toLong, k.toLong)).toSet
      assert(got == want, s"sample $i")
    }
  }

  test("AsOfJoin equals per-row brute force on random keyed timelines") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 100L))),   // left
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 100L))))   // right
    for (((ls, rsRaw), i) <- samples(gen, 4).zipWithIndex) {
      // right side unique per (key, time): keep max payload
      val rs = rsRaw.zipWithIndex.map { case ((k, t), j) => (k, t, j.toLong) }
        .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq
      val left = ls.zipWithIndex.map { case ((k, t), j) => (j.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.toDF("k", "rt", "payload")
      val got = graft.ops.AsOfJoin.join(left, right, "k", "t", "rt", Seq("payload"))
        .select("lid", "asof_payload").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = (for {
        ((k, t), j) <- ls.zipWithIndex
        cands = rs.filter(r => r._1 == k && r._2 <= t)
        if cands.nonEmpty
      } yield j.toLong -> cands.maxBy(r => (r._2, r._3))._3).toMap
      assert(got == want, s"sample $i")
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
