package graft.ops

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {

  test("as-of picks the most recent right row at or before the left time") {
    import spark.implicits._
    val quotes = Seq(("A", 10L, 100L), ("A", 20L, 110L), ("B", 15L, 900L))
      .toDF("sym", "qts", "px")
    val trades = Seq(("A", 5L, 1L), ("A", 10L, 2L), ("A", 25L, 3L),
                     ("B", 14L, 4L), ("C", 50L, 5L))
      .toDF("sym", "tts", "trade_id")
    val out = AsOfJoin.join(trades, quotes, key = "sym",
        leftTime = "tts", rightTime = "qts", valueCols = Seq("px"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    // trade 1 (t=5) and trade 4 (B, t=14, quote at 15): no quote yet ->
    // dropped (inner). trade 2 (t=10): equal time matches (<=).
    // trade 3 (t=25): latest quote 110. C has no quotes at all.
    assert(out == Map(2L -> 100L, 3L -> 110L))
  }

  test("outer mode keeps unmatched left rows with nulls") {
    import spark.implicits._
    val quotes = Seq(("A", 10L, 100L)).toDF("sym", "qts", "px")
    val trades = Seq(("A", 5L, 1L), ("A", 15L, 2L)).toDF("sym", "tts", "trade_id")
    val out = AsOfJoin.join(trades, quotes, "sym", "tts", "qts", Seq("px"),
        inner = false)
      .collect().map(r => (r.getLong(2), Option(r.get(3)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(100L)))
  }
}
