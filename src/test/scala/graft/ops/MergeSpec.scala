package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** CDC merge semantics: upsert/delete/insert resolution, latest-version
  * wins, and the scale-safe plan shape (aggregate, not window). */
class MergeSpec extends SparkTestBase {

  private def apply2(base: Seq[(Long, String, Long)],
                     changes: Seq[(Long, String, String, Long, Long)]) = {
    import spark.implicits._
    Merge.applyChanges(
      base.toDF("k", "name", "amount"),
      changes.toDF("k", "op", "name", "amount", "version"),
      "k", "op", "version", Seq("name", "amount"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  test("update replaces, delete removes, insert adds, untouched rows stay") {
    val out = apply2(
      base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)),
      changes = Seq(
        (2L, "U", "b2", 21L, 1L),
        (3L, "D", "", 0L, 1L),
        (4L, "I", "d", 40L, 1L)))
    assert(out == Seq((1L, "a", 10L), (2L, "b2", 21L), (4L, "d", 40L)))
  }

  test("latest version wins per key — an update after a delete revives") {
    val out = apply2(
      base = Seq((1L, "a", 10L), (2L, "b", 20L)),
      changes = Seq(
        (1L, "U", "a1", 11L, 1L),
        (1L, "U", "a2", 12L, 2L),   // later version supersedes
        (2L, "D", "", 0L, 1L),
        (2L, "U", "b9", 29L, 2L)))  // revival: U at v2 beats D at v1
    assert(out == Seq((1L, "a2", 12L), (2L, "b9", 29L)))
  }

  test("delete of a missing key is a no-op; delete beats earlier update") {
    val out = apply2(
      base = Seq((1L, "a", 10L)),
      changes = Seq(
        (9L, "D", "", 0L, 1L),      // no such key — nothing to emit
        (1L, "U", "a1", 11L, 1L),
        (1L, "D", "", 0L, 2L)))     // latest is the delete
    assert(out == Seq.empty)
  }

  private def scd2(history: Seq[(Long, String, Long, Long, Option[Long])],
                   changes: Seq[(Long, String, String, Long, Long)]) = {
    import spark.implicits._
    Merge.applyChangesScd2(
      history.toDF("k", "name", "amount", "valid_from", "valid_to"),
      changes.toDF("k", "op", "name", "amount", "version"),
      "k", "op", "version", Seq("name", "amount"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._4)).toSeq
  }

  test("scd2: update chain becomes contiguous intervals, last one open") {
    val out = scd2(
      history = Seq((1L, "a", 10L, 0L, None)),
      changes = Seq((1L, "U", "a1", 11L, 3L), (1L, "U", "a2", 12L, 7L)))
    assert(out == Seq(
      (1L, "a", 10L, 0L, Some(3L)),
      (1L, "a1", 11L, 3L, Some(7L)),
      (1L, "a2", 12L, 7L, None)))
  }

  test("scd2: delete closes without opening; a later insert revives") {
    val out = scd2(
      history = Seq((1L, "a", 10L, 0L, None), (2L, "b", 20L, 0L, None)),
      changes = Seq(
        (1L, "D", "", 0L, 4L),
        (1L, "I", "a9", 19L, 8L)))  // gap [4,8): key 1 did not exist
    assert(out == Seq(
      (1L, "a", 10L, 0L, Some(4L)),
      (1L, "a9", 19L, 8L, None),
      (2L, "b", 20L, 0L, None)))    // untouched key stays current
  }

  test("scd2: closed past rows pass through unmodified") {
    val out = scd2(
      history = Seq((1L, "old", 1L, 0L, Some(2L)), (1L, "a", 10L, 2L, None)),
      changes = Seq((1L, "U", "a1", 11L, 5L)))
    assert(out == Seq(
      (1L, "old", 1L, 0L, Some(2L)),
      (1L, "a", 10L, 2L, Some(5L)),
      (1L, "a1", 11L, 5L, None)))
  }

  test("scd2 + snapshotAsOf time-travel equals merge of the changes <= v") {
    import spark.implicits._
    val history = Seq((1L, "a", 10L, 0L, None: Option[Long]),
      (2L, "b", 20L, 0L, None: Option[Long]))
      .toDF("k", "name", "amount", "valid_from", "valid_to")
    val feed = Seq(
      (1L, "U", "a1", 11L, 3L), (2L, "D", "", 0L, 4L),
      (3L, "I", "c", 30L, 5L), (1L, "U", "a2", 12L, 6L))
    val full = Merge.applyChangesScd2(history,
      feed.toDF("k", "op", "name", "amount", "version"),
      "k", "op", "version", Seq("name", "amount"))

    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    for (v <- Seq(0L, 3L, 4L, 5L, 6L, 99L)) {
      val expected = snap(Merge.applyChanges(
        Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "name", "amount"),
        feed.filter(_._5 <= v).toDF("k", "op", "name", "amount", "version"),
        "k", "op", "version", Seq("name", "amount")))
      assert(snap(Merge.snapshotAsOf(full, v)) == expected, s"as of v=$v")
    }
  }

  test("plan ranks changes with an aggregate, not a per-key window sort") {
    import spark.implicits._
    val plan = Merge.applyChanges(
      Seq((1L, "a", 10L)).toDF("k", "name", "amount"),
      Seq((1L, "U", "a1", 11L, 1L)).toDF("k", "op", "name", "amount", "version"),
      "k", "op", "version", Seq("name", "amount"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Aggregate"), plan)
  }
}
