package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.hadoop.fs.Path

import graft.SparkTestBase
import graft.ops.Snapshots

/** Exactly-once invariants of the snapshot-table streaming sink: a
  * replayed batch commits nothing, the marker travels atomically with
  * its manifest, and the stream's output is a full-featured Snapshots
  * table (versions, pinned reads, diff) afterward. */
class SnapshotSinkSpec extends SparkTestBase {

  private def wipe(paths: String*): Unit = paths.foreach { d =>
    val p = new Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("a replayed batchId is recognized and commits nothing") {
    import spark.implicits._
    val loc = "/tmp/graft-test/snap_sink_replay"
    wipe(loc)
    val b0 = Seq(1L, 2L).toDF("id")
    val b1 = Seq(3L).toDF("id")
    assert(SnapshotSink.commitBatch(b0, loc, 0L) == 1L)
    assert(SnapshotSink.commitBatch(b1, loc, 1L) == 2L)
    // at-least-once delivery: batch 1 arrives again
    assert(SnapshotSink.commitBatch(b1, loc, 1L) == -1L)
    assert(Snapshots.latestVersion(spark, loc) == 2L)
    assert(Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(Snapshots.markers(spark, loc) == Set("batch=0", "batch=1"))
  }

  test("bucketed streaming ingest keeps the layout; replayed epochs skip") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val loc = "/tmp/graft-test/snap_sink_bucketed"
    val ckpt = "/tmp/graft-test/snap_sink_bucketed_ckpt"
    wipe(loc, ckpt)
    Snapshots.commitAppend((1L to 50L).map(i => (i, i)).toDF("id", "v"), loc)
    graft.ops.BucketLayout.commitBucketed(spark, loc, "id", 4)
    val mem = MemoryStream[Long]
    val q = SnapshotSink.snapshotTableBucketed(
      mem.toDF().select(org.apache.spark.sql.functions.col("value").as("id"),
        org.apache.spark.sql.functions.col("value").as("v")), loc, ckpt)
    try {
      mem.addData(51L, 52L); q.processAllAvailable()
      mem.addData(53L); q.processAllAvailable()
    } finally q.stop()
    // every epoch's files are bucket-routed, so the layout survived
    assert(Snapshots.versionLayout(spark, loc,
      Snapshots.latestVersion(spark, loc)).contains("bucket,4,id"))
    assert(Snapshots.read(spark, loc).count() == 53L)
    // at-least-once replay of a committed epoch commits nothing
    assert(SnapshotSink.commitBatchBucketed(
      Seq((53L, 53L)).toDF("id", "v"), loc, 1L) == -1L)
    assert(Snapshots.read(spark, loc).count() == 53L)
  }

  test("end-to-end: MemoryStream into a snapshot table, replay after 'crash', lifecycle intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val loc = "/tmp/graft-test/snap_sink_stream"
    val ckpt = "/tmp/graft-test/snap_sink_stream_ckpt"
    wipe(loc, ckpt)
    val mem = MemoryStream[Long]
    val q = SnapshotSink.snapshotTable(mem.toDF().toDF("id"), loc, ckpt)
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      mem.addData(3L, 4L)
      q.processAllAvailable()
    } finally q.stop()
    val v2 = Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq
    assert(v2 == Seq(1L, 2L, 3L, 4L))
    // crash-between-write-and-commit: batch 1's rows delivered again
    // under the original batchId — skipped, table bit-stable
    assert(SnapshotSink.commitBatch(Seq(3L, 4L).toDF("id"), loc, 1L) == -1L)
    assert(Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq == v2)
    // the output is a real table: pinned version read + diff work on it
    assert(Snapshots.read(spark, loc, 1).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    val d = Snapshots.diff(spark, loc, 1, 2)
    assert(d.filter(org.apache.spark.sql.functions.col("change") === "insert")
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("DSv2 route: writeStream into the snapshot provider, restart replays nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val loc = "/tmp/graft-test/snap_sink_dsv2"
    val ckpt = "/tmp/graft-test/snap_sink_dsv2_ckpt"
    wipe(loc, ckpt)
    val mem = MemoryStream[Long]
    def start() = mem.toDF().toDF("id").writeStream
      .format(classOf[graft.sources.v2.SnapshotStreamProvider].getName)
      .option("location", loc)
      .option("checkpointLocation", ckpt)
      .start()
    val q = start()
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      mem.addData(3L, 4L)
      q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    // the first streaming commit CREATED the table with a schema header:
    // typed reads need no footer inference
    assert(Snapshots.read(spark, loc, 1).schema.fieldNames.toSeq == Seq("id"))
    // a RESTART from the same checkpoint re-opens the query; already
    // committed epochs must not replay into the table
    val vBefore = Snapshots.latestVersion(spark, loc)
    val q2 = start()
    try {
      mem.addData(5L)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    assert(Snapshots.latestVersion(spark, loc) == vBefore + 1,
      "restart must append exactly the new epoch, no replays")
    // crash-window replay: the same (query, epoch) marker commits nothing
    // (simulated by re-publishing under epoch 0's marker semantics via
    // the API: the marker set survives in manifest headers)
    assert(Snapshots.markers(spark, loc).exists(_.startsWith("batch=")),
      "streaming commits must ride idempotence markers")
  }

  test("DSv2 route: writeStream.toTable through the snapshot catalog") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft-test/snap_sink_cat"
    val loc = s"$root/t_stream"
    val ckpt = "/tmp/graft-test/snap_sink_cat_ckpt"
    wipe(root, ckpt)
    spark.conf.set("spark.sql.catalog.sinkcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.sinkcat.root", root)
    val mem = MemoryStream[Long]
    // toTable resolves through the catalog: CREATE (empty schema-bearing
    // v1) then exactly-once appends per epoch
    val q = mem.toDF().toDF("id").writeStream
      .option("checkpointLocation", ckpt)
      .toTable("sinkcat.t_stream")
    try {
      mem.addData(10L, 11L)
      q.processAllAvailable()
      mem.addData(12L)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT id FROM sinkcat.t_stream").as[Long]
      .collect().sorted.toSeq == Seq(10L, 11L, 12L))
    // and it is a full lifecycle table: SQL DML works on the stream output
    spark.sql("DELETE FROM sinkcat.t_stream WHERE id = 11")
    assert(spark.sql("SELECT id FROM sinkcat.t_stream").as[Long]
      .collect().sorted.toSeq == Seq(10L, 12L))
  }

  test("two live attempts of the same batchId commit exactly once (zombie fence)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val loc = "/tmp/graft-test/snap_sink_zombie"
    wipe(loc)
    SnapshotSink.commitBatch(Seq(0L).toDF("id"), loc, 0L)
    // a restarted driver re-runs batch 1 while its predecessor's attempt
    // is still in flight — both pass any pre-check taken before the race
    val gate = new java.util.concurrent.CountDownLatch(1)
    def attempt() = Future {
      gate.await()
      SnapshotSink.commitBatch(Seq(7L, 8L).toDF("id"), loc, 1L)
    }
    val a = attempt(); val b = attempt()
    gate.countDown()
    val results = Seq(Await.result(a, 2.minutes), Await.result(b, 2.minutes))
    // one attempt published, the other detected the marker inside the
    // CAS loop and aborted — never two copies of the batch
    assert(results.count(_ == -1L) == 1, s"zombie fence failed: $results")
    assert(results.max == 2L)
    assert(Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq
      == Seq(0L, 7L, 8L))
    assert(Snapshots.markers(spark, loc) == Set("batch=0", "batch=1"))
  }

  test("torture: streaming epochs race batch INSERTs and CALL optimize_small — linear history, nothing lost, nothing doubled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft-test/snap_sink_torture"
    val loc = s"$root/t"
    val ckpt = "/tmp/graft-test/snap_sink_torture_ckpt"
    wipe(root, ckpt)
    spark.conf.set("spark.sql.catalog.torturecat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.torturecat.root", root)
    Snapshots.commitAppend(Seq(-1L).toDF("id"), loc) // seed v1
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("id").writeStream
      .format(classOf[graft.sources.v2.SnapshotStreamProvider].getName)
      .option("location", loc)
      .option("checkpointLocation", ckpt)
      .start()
    // three commit kinds interleave on one table: streaming epochs,
    // SQL INSERTs (CAS-retry appends), and incremental compaction
    // (CAS loop that recomputes against the new latest on a lost race)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val inserter = new Thread(() => try {
      (0 until 5).foreach { i =>
        spark.sql(s"INSERT INTO torturecat.t VALUES (${1000L + i})")
      }
    } catch { case t: Throwable => errs.add(t) })
    val optimizer = new Thread(() => try {
      (0 until 3).foreach { _ =>
        spark.sql("CALL torturecat.system.optimize_small('t', 32, 128)")
        Thread.sleep(20L)
      }
    } catch { case t: Throwable => errs.add(t) })
    inserter.start(); optimizer.start()
    try {
      (0 until 5).foreach { i =>
        mem.addData(i * 10L, i * 10L + 1L)
        q.processAllAvailable()
      }
    } finally { inserter.join(); optimizer.join(); q.stop() }
    assert(errs.isEmpty, s"concurrent committers failed: ${errs.toArray.toSeq}")
    // linear history: every version from 1 to latest published and reads
    val vmax = Snapshots.latestVersion(spark, loc)
    (1L to vmax).foreach(v =>
      assert(Snapshots.versionFiles(spark, loc, v) != null))
    // no lost epoch, no lost insert, no double-publish: the final state
    // is exactly the seed + 10 streamed ids + 5 inserted ids, once each
    val want = (Seq(-1L) ++ (0 until 5).flatMap(i => Seq(i * 10L, i * 10L + 1L))
      ++ (0 until 5).map(i => 1000L + i)).sorted
    val got = Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq
    assert(got == want, s"history v1..$vmax lost or doubled rows")
    // every streamed epoch rides its idempotence marker
    assert(Snapshots.markers(spark, loc).count(_.startsWith("epoch=")) > 0 ||
      Snapshots.markers(spark, loc).count(_.startsWith("batch=")) > 0)
  }

  test("markers expire with their versions (retention must cover the replay horizon)") {
    import spark.implicits._
    val loc = "/tmp/graft-test/snap_sink_retention"
    wipe(loc)
    SnapshotSink.commitBatch(Seq(1L).toDF("id"), loc, 0L)
    SnapshotSink.commitBatch(Seq(2L).toDF("id"), loc, 1L)
    Snapshots.expire(spark, loc, retainLast = 1)
    // batch 0's marker is forgotten with its manifest: a replay past the
    // retention horizon would re-commit — the documented trade
    assert(Snapshots.markers(spark, loc) == Set("batch=1"))
  }
}
