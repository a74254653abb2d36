package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.ops.Snapshots

/** Incremental-consumer invariants: split consumption equals one-shot
  * consumption, an unmoved table never invokes the handler, and a crash
  * before the cursor advances replays the interval (at-least-once). */
class SnapshotTailSpec extends SparkTestBase {

  private def wipe(paths: String*): Unit = paths.foreach { d =>
    val p = new Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("consuming in two steps equals consuming once; empty interval = no call") {
    import spark.implicits._
    val loc = "/tmp/graft-test/tail_table"
    val ck1 = "/tmp/graft-test/tail_ck1"
    val ck2 = "/tmp/graft-test/tail_ck2"
    wipe(loc, ck1, ck2)
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def handler(buf: scala.collection.mutable.ArrayBuffer[(String, Long, Long)])(
        df: org.apache.spark.sql.DataFrame): Unit =
      buf ++= df.select("change", "_commit_version", "id")
        .as[(String, Long, Long)].collect()

    Snapshots.commitAppend(Seq(1L, 2L).toDF("id"), loc)
    assert(SnapshotTail.processOnce(spark, loc, ck1)(handler(got)) == 1L)
    Snapshots.commitAppend(Seq(3L).toDF("id"), loc)
    Snapshots.commitDelete(spark, loc, col("id") === 2L)
    assert(SnapshotTail.processOnce(spark, loc, ck1)(handler(got)) == 3L)
    // the same history consumed in ONE step by a second consumer
    val oneShot = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    assert(SnapshotTail.processOnce(spark, loc, ck2)(handler(oneShot)) == 3L)
    assert(got.sorted.toSeq == oneShot.sorted.toSeq)
    // unmoved table: cursor stays, handler not invoked
    var called = false
    assert(SnapshotTail.processOnce(spark, loc, ck1)(_ => called = true) == 3L)
    assert(!called)
  }

  test("a crash before the cursor advances replays the interval") {
    import spark.implicits._
    val loc = "/tmp/graft-test/tail_crash"
    val ck = "/tmp/graft-test/tail_crash_ck"
    wipe(loc, ck)
    Snapshots.commitAppend(Seq(1L).toDF("id"), loc)
    intercept[RuntimeException](
      SnapshotTail.processOnce(spark, loc, ck)(_ =>
        throw new RuntimeException("consumer died mid-handler")))
    assert(SnapshotTail.position(spark, ck) == 0L) // cursor did NOT advance
    val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
    SnapshotTail.processOnce(spark, loc, ck)(df =>
      rows ++= df.select("id").as[Long].collect())
    assert(rows.sorted.toSeq == Seq(1L)) // the interval replayed in full
    assert(SnapshotTail.position(spark, ck) == 1L)
  }
}
