package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for [[EditSimilarity.editDistanceJoin]]: the PassJoin segment
  * filter must be LOSSLESS (exact equality with brute force), including
  * the shapes that stress each part of the pigeonhole argument — maximal
  * position shift from prefix insertions, edits straddling segment
  * boundaries, strings too short to segment, and pairs just past the
  * threshold.
  */
class EditSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def brute(docs: org.apache.spark.sql.DataFrame, t: Int, plen: Int) = {
    val p = docs.select(col("id"), substring(col("text"), 1, plen).as("s"))
    p.as("a").join(p.as("b"), col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")))
      .filter(col("dist") <= t)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("dist"))
  }

  private def run(docs: org.apache.spark.sql.DataFrame, t: Int, plen: Int) =
    EditSimilarity.editDistanceJoin(docs, "id", "text", t, plen)

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("matches brute force exactly on the real corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val got = asSet(run(docs, t = 6, plen = 80))
    val want = asSet(brute(docs, t = 6, plen = 80))
    assert(got === want)
    assert(want.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("maximal shift: t leading insertions still found, t+1 not") {
    val s = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s),
      (2L, "XYZ" + s),   // 3 leading inserts — every segment shifts by 3
      (3L, "ABCD" + s)   // 4 leading inserts — past the t=3 threshold
    ).toDF("id", "text")
    val got = asSet(run(docs, t = 3, plen = 200))
    assert(got.contains((1L, 2L, 3)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
    // 2 vs 3: "XYZ"→"ABCD" is 4 edits, also out
    assert(got === asSet(brute(docs, t = 3, plen = 200)))
  }

  test("edits spread across segment boundaries") {
    // t=4 → 5 segments of 12 over a 60-char string; place one edit
    // inside each of 4 different segments so only one segment survives
    // untouched — the minimum the pigeonhole guarantees.
    val s = "aaaaaaaaaaaabbbbbbbbbbbbccccccccccccddddddddddddeeeeeeeeeeee"
    val edited = s.updated(1, 'X').updated(13, 'Y').updated(26, 'Z').updated(50, 'W')
    val docs = Seq((1L, s), (2L, edited)).toDF("id", "text")
    val got = asSet(run(docs, t = 4, plen = 100))
    assert(got === Set((1L, 2L, 4)))
  }

  test("strings shorter than t+1 chars pair through the short-residue path") {
    val docs = Seq(
      (1L, "ab"), (2L, "ax"),          // dist 1, both below k=4
      (3L, "abcdefghij"), (4L, "ab")   // 4L vs 1L dist 0 is a dup pair
    ).toDF("id", "text")
    val got = asSet(run(docs, t = 3, plen = 80))
    val want = asSet(brute(docs, t = 3, plen = 80))
    assert(got === want)
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 4L, 0)))
  }

  test("two-relation join == brute cross filter on batch vs corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val batch = docs.filter(col("id") % 2 === 1)
    val corpus = docs.filter(col("id") % 2 === 0)
    val got = EditSimilarity.editDistanceJoinBetween(
        batch, "id", "text", corpus, "id", "text", t = 6, prefixLen = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bp = batch.select(col("id").as("pid"), substring(col("text"), 1, 80).as("ps"))
    val br = corpus.select(col("id").as("rid"), substring(col("text"), 1, 80).as("rs"))
    val want = bp.crossJoin(br)
      .withColumn("dist", levenshtein(col("ps"), col("rs")))
      .filter(col("dist") <= 6)
      .select(col("pid"), col("rid"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("randomized corpora over a 2-letter alphabet match brute force") {
    import org.scalacheck.{Gen, rng}
    // low-entropy alphabet forces segment collisions, tied distances,
    // and every length class from empty through past-segmenting
    val strGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val corpusGen = Gen.listOfN(16, strGen)
    for (seed <- 0 until 4; t <- Seq(1, 3)) {
      val texts = corpusGen(Gen.Parameters.default, rng.Seed(1000L * seed + t)).get
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      val got = asSet(run(docs, t, plen = 80))
      val want = asSet(brute(docs, t, plen = 80))
      assert(got === want, s"seed=$seed t=$t corpus=$texts")
    }
  }

  test("corpus-wide constant header is stripped before segmenting") {
    // every string shares a 44-char header — without LCP stripping the
    // segments covering it are corpus-sized buckets; with it the join
    // runs on the distinctive tails and stays exact
    val header = "GRAFT-DOC-FORMAT-1;charset=ascii;population="
    val docs = (1L to 40L)
      .map(i => (i, header + s"row $i with tail ${"pad" * (i % 7).toInt}"))
      .toDF("id", "text")
    assert(asSet(run(docs, t = 6, plen = 200)) === asSet(brute(docs, t = 6, plen = 200)))
  }

  test("all-identical corpus: every pair at distance zero") {
    val docs = (1L to 6L).map(i => (i, "same text everywhere")).toDF("id", "text")
    val got = asSet(run(docs, t = 2, plen = 80))
    assert(got === (for { a <- 1L to 6L; b <- 1L to 6L if a < b } yield (a, b, 0)).toSet)
  }

  test("mixed lengths around the segmenting floor match brute force") {
    // lengths straddling k..k+t where the probe window clamps
    val docs = (1L to 12L).map(i => (i, "abcdefghijkl".take(2 + (i % 9).toInt)))
      .toDF("id", "text")
    assert(asSet(run(docs, t = 3, plen = 80)) === asSet(brute(docs, t = 3, plen = 80)))
  }

  test("deletion-neighborhood join == segment join == brute force at t=1") {
    import org.scalacheck.{Gen, rng}
    // low-entropy strings force variant collisions (equal strings, runs
    // of one letter) and every length class incl. empty
    val strGen = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (seed <- 0 until 4) {
      val texts = Gen.listOfN(18, strGen)(
        Gen.Parameters.default, rng.Seed(77L + seed)).get
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "text")
      val probe = docs.filter(col("id") % 2 === 1)
      val ref = docs.filter(col("id") % 2 === 0)
      def asPairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val del = asPairs(EditSimilarity.deletionJoinBetween(
        probe, "id", "text", ref, "id", "text", prefixLen = 80))
      val seg = asPairs(EditSimilarity.editDistanceJoinBetween(
        probe, "id", "text", ref, "id", "text", t = 1, prefixLen = 80))
      assert(del === seg, s"seed=$seed corpus=$texts")
    }
  }

  test("deletion-neighborhood blocks compose into the join key (cross-block never matches)") {
    val probe = Seq((1L, "alpha", 10), (2L, "beta", 20)).toDF("id", "text", "blk")
    val ref = Seq((11L, "alpha", 10),   // same block: match at 0
      (12L, "alpha", 99),               // other block: never a candidate
      (13L, "betaa", 20)                // same block: dist 1
    ).toDF("id", "text", "blk")
    val got = EditSimilarity.deletionJoinBetween(
        probe, "id", "text", ref, "id", "text", prefixLen = 80,
        blockCols = Seq("blk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 11L, 0), (2L, 13L, 1)))
  }
}
