package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.ops.Merge
import graft.streaming.CdcStreams.{cdcSnapshot, snapshotOf, Change, SnapUpdate}

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
