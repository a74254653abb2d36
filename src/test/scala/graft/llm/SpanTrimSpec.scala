package graft.llm

import graft.SparkTestBase

/** [[SpanTrim.trimDuplicatedSpans]]: positional exact-substring trimming.
  * Pins maximal-span merging (overlapping duplicated grams fuse into one
  * island), the exact edit (trimmed text = tokens outside covered
  * positions, order preserved), the cross-document rule (within-doc
  * repetition alone never trims), short-document immunity, and the
  * all-removed empty-string case.
  */
class SpanTrimSpec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private def run(docs: Seq[(Long, String)], width: Int = 4): DataFrame = {
    import spark.implicits._
    SpanTrim.trimDuplicatedSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", width = width, minDocs = 2)
  }

  test("a shared run longer than width trims as ONE maximal span") {
    // "c d e f g h" (6 tokens) shared; width 4 → 3 overlapping grams,
    // covering positions merge into a single island of 6 tokens
    val out = run(Seq(
      (1L, "a b c d e f g h x y"),
      (2L, "q r c d e f g h"))).collect()
    assert(out.length === 2)
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(1L) === ((1L, 6L, "a b x y")))
    assert(byId(2L) === ((1L, 6L, "q r")))
  }

  test("within-doc repetition alone does not trim; cross-doc does") {
    val out = run(Seq(
      (1L, "p q r s p q r s"),      // repeats its own gram only
      (2L, "unrelated words here entirely different"))).collect()
    assert(out.isEmpty, "minDocs=2 needs two distinct documents")
  }

  test("documents shorter than width are untouched; full cover empties") {
    val out = run(Seq(
      (1L, "a b c"),                // 3 tokens < width 4: no grams
      (2L, "w x y z"),              // exactly one gram, shared with 3
      (3L, "w x y z"))).collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(!byId.contains(1L))
    assert(byId(2L) === ((1L, 4L, "")))
    assert(byId(3L) === ((1L, 4L, "")))
  }

  test("two disjoint shared regions produce two spans") {
    val out = run(Seq(
      (1L, "a1 a2 a3 a4 mid1 mid2 mid3 b1 b2 b3 b4"),
      (2L, "a1 a2 a3 a4 zzz1 zzz2 zzz3 b1 b2 b3 b4"))).collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(1L) === ((2L, 8L, "mid1 mid2 mid3")))
    assert(byId(2L) === ((2L, 8L, "zzz1 zzz2 zzz3")))
  }
}
