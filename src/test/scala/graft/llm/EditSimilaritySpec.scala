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

  test("mixed lengths around the segmenting floor match brute force") {
    // lengths straddling k..k+t where the probe window clamps
    val docs = (1L to 12L).map(i => (i, "abcdefghijkl".take(2 + (i % 9).toInt)))
      .toDF("id", "text")
    assert(asSet(run(docs, t = 3, plen = 80)) === asSet(brute(docs, t = 3, plen = 80)))
  }
}
