package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.ops.Merge
import graft.streaming.CdcStreams.{cdcScd2, cdcSnapshot, historyOf, snapshotOf, Change, HistRow, KeyHistory, SnapUpdate}

/** Stream-side CDC: the mapGroupsWithState snapshot fold converges to
  * exactly the batch Merge result on a shared feed, however the feed is
  * split into micro-batches, and tombstones survive across batches. */
class CdcStreamsSpec extends SparkTestBase {

  private val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
  private val feed = Seq(
    Change(2L, "U", "b2", 21L, 1L),
    Change(3L, "D", "", 0L, 1L),
    Change(4L, "I", "d", 40L, 1L),
    Change(2L, "U", "b3", 22L, 2L),  // supersedes b2
    Change(5L, "I", "e", 50L, 1L),
    Change(5L, "D", "", 0L, 2L),     // inserted then deleted
    Change(1L, "U", "aX", 99L, 1L),
    Change(1L, "U", "a1", 11L, 2L))  // delivered out of version order below

  private def batchResult: Seq[(Long, String, Long)] = {
    import spark.implicits._
    Merge.applyChanges(
      base.toDF("k", "name", "amount"),
      feed.toDF("k", "op", "name", "amount", "version"),
      "k", "op", "version", Seq("name", "amount"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  test("stream snapshot equals batch merge across asymmetric micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = cdcSnapshot(mem.toDS())
      .writeStream.format("memory").queryName("cdc_snap")
      .outputMode("update").start()
    try {
      // base as version-0 inserts, then the feed in uneven splits with
      // the higher-version change for key 1 arriving BEFORE the lower
      mem.addData(base.map { case (k, n, a) => Change(k, "I", n, a, 0L) })
      q.processAllAvailable()
      mem.addData(feed(7), feed(0), feed(1))   // a1@v2 first
      q.processAllAvailable()
      mem.addData(feed(2), feed(3), feed(6))   // aX@v1 must NOT win
      q.processAllAvailable()
      mem.addData(feed(4), feed(5))
      q.processAllAvailable()
    } finally q.stop()

    val snap = snapshotOf(spark.table("cdc_snap").as[SnapUpdate])
      .collect().sortBy(_._1).toSeq
    assert(snap == batchResult)
    assert(snap == Seq((1L, "a1", 11L), (2L, "b3", 22L), (4L, "d", 40L)))
  }

  test("stream SCD2 history equals batch applyChangesScd2 under any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // base as version-0 inserts + the shared feed; (k, version, op) is
    // unique, which is the batch API's own precondition and what makes
    // its (version, op) window order total
    val allChanges = base.map { case (k, n, a) => Change(k, "I", n, a, 0L) } ++ feed
    val emptyHist = Seq.empty[(Long, String, Long, Long, Option[Long])]
      .toDF("k", "name", "amount", "valid_from", "valid_to")
    val want = Merge.applyChangesScd2(emptyHist,
        allChanges.toDF("k", "op", "name", "amount", "version"),
        "k", "op", "version", Seq("name", "amount"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

    val splits: Seq[Seq[Seq[Change]]] = Seq(
      Seq(allChanges),                                  // one batch
      allChanges.map(Seq(_)),                           // one change per batch
      Seq(allChanges.take(4), Seq(feed(7), feed(0)),    // uneven, with the
        Seq(feed(1), feed(2), feed(3), feed(6)),        // higher-version
        Seq(feed(4), feed(5))))                         // change first for k=1
    for ((split, si) <- splits.zipWithIndex) {
      val mem = MemoryStream[Change]
      val name = s"cdc_scd2_$si"
      val q = cdcScd2(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        split.foreach { b => mem.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val got = historyOf(spark.table(name).as[KeyHistory])
        .collect().map(h => (h.k, h.name, h.amount, h.valid_from, h.valid_to))
        .toSet
      assert(got == want,
        s"split $si: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
    // sanity on the fixture itself: deleted key 3 has a closed interval
    // chain, revived-never key 5 opens and closes, k=1 supersedes in order
    assert(want.contains((1L, "a", 10L, 0L, Some(1L))))
    assert(want.contains((1L, "a1", 11L, 2L, None)))
    assert(!want.exists { case (k, _, _, _, to) => k == 3L && to.isEmpty })
  }

  test("tombstone retention: an expired tombstone accepts a fresh insert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // With ProcessingTimeTimeout the engine keeps scheduling batches to
    // fire timers (shouldRunAnotherBatch is always true), so noNewData
    // never latches and processAllAvailable would block forever — poll
    // the sink instead of synchronizing on "all available processed".
    def eventually(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (!cond) {
        if (System.nanoTime > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    val mem = MemoryStream[Change]
    val q = cdcSnapshot(mem.toDS(), tombstoneRetentionMs = Some(100L))
      .writeStream.format("memory").queryName("cdc_retention")
      .outputMode("update").start()
    try {
      mem.addData(Change(7L, "D", "", 0L, 5L))
      eventually("tombstone emitted")(
        spark.table("cdc_retention").count() >= 1)
      // the timer-driven batch loop evicts the tombstone ~100ms later;
      // wait well past the retention window before re-ingesting the key
      Thread.sleep(600)
      // lower version than the forgotten delete — accepted as fresh
      mem.addData(Change(8L, "I", "x", 1L, 1L),
        Change(7L, "I", "back", 2L, 1L))
      eventually("revived key emitted")(
        spark.table("cdc_retention").as[SnapUpdate].collect()
          .exists(u => u.k == 7L && u.name == "back"))
    } finally q.stop()
    // once a tombstone is forgotten, version order and emission order
    // diverge BY DESIGN (the revival has a lower version than the
    // forgotten delete) — a keyed update-mode sink keeps the latest
    // EMISSION per key, so fold the sink in batch-append order
    val rows = spark.table("cdc_retention").as[SnapUpdate].collect()
    val snap = rows.zipWithIndex.groupBy(_._1.k)
      .map { case (_, xs) => xs.maxBy(_._2)._1 }
      .filterNot(_.deleted).map(u => (u.k, u.name, u.amount))
      .toSeq.sortBy(_._1)
    assert(snap == Seq((7L, "back", 2L), (8L, "x", 1L)))
  }

  test("tombstone in state: a late lower-version update cannot resurrect") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = cdcSnapshot(mem.toDS())
      .writeStream.format("memory").queryName("cdc_tomb")
      .outputMode("update").start()
    try {
      mem.addData(Change(7L, "D", "", 0L, 5L)); q.processAllAvailable()
      mem.addData(Change(7L, "U", "ghost", 1L, 3L)); q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("cdc_tomb").as[SnapUpdate]
      .collect().maxBy(_.version)
    assert(last.deleted && last.version == 5L)
    assert(snapshotOf(spark.table("cdc_tomb").as[SnapUpdate]).collect().isEmpty)
  }
}
