package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Drives the EventStreams builders on a real streaming source
  * (MemoryStream + writeStream to a memory sink) — watermarked tumbling
  * windows, session windows, and the flatMapGroupsWithState sessionizer.
  * The same builders are oracle-checked in batch via AnalyticsQueries;
  * this spec proves they run as actual incremental streaming queries.
  */
class StreamingSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  case class E(event_id: Long, ts: Timestamp, user_id: Long,
               event_type: String, value: Double, props: String)

  private def mkEvents: Seq[E] = Seq(
    E(1, ts(0), 1, "click", 1.0, "{}"),
    E(2, ts(5), 1, "click", 2.0, "{}"),
    E(3, ts(10), 2, "view", 3.0, "{}"),
    E(4, ts(50), 1, "click", 4.0, "{}"), // new session for user 1 (gap 45m)
    E(5, ts(59), 2, "view", 5.0, "{}"),
  )

  test("watermarked tumbling windows over a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[E]
    val q = EventStreams
      .watermarkedTumbling(mem.toDF(), delay = "10 minutes", width = "30 minutes")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .select($"wstart", $"event_type", $"n", $"sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set(
        ("2026-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2026-01-01 10:00:00.0", "view", 1L, 3.0),
        ("2026-01-01 10:30:00.0", "click", 1L, 4.0),
        ("2026-01-01 10:30:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("session windows over a MemoryStream (watermark + append)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[E]
    val q = EventStreams
      .sessionized(mem.toDF().withWatermark("ts", "2 hours"), gap = "30 minutes")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .select($"user_id", $"session_start", $"n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
        .toSet
      assert(rows == Set(
        (1L, "2026-01-01 10:00:00.0", 2L),
        (1L, "2026-01-01 10:50:00.0", 1L),
        (2L, "2026-01-01 10:10:00.0", 1L),
        (2L, "2026-01-01 10:59:00.0", 1L)))
    } finally q.stop()
  }

  test("file-source streaming: readStream over the events parquet equals batch") {
    import spark.implicits._
    // stage the driver-generated events table as a streaming source dir
    val srcDir = java.nio.file.Files.createTempDirectory("evt_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      srcDir.resolve("events.parquet"))
    val batch = graft.core.Tables.events(spark, sf0001)
    // raw file schema + the same normalization batch uses: ts is INT64
    // nanos in some testdata generations (read as LongType under
    // nanosAsLong) and a native µs timestamp in others — apply the
    // div-1000 rescale only in the former case, exactly like Tables.events
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    val streamRaw = spark.readStream.schema(raw.schema).parquet(srcDir.toString)
    val stream = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        streamRaw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => streamRaw
    }
    val q = EventStreams.tumbling(stream, "1 hour")
      .writeStream.format("memory").queryName("file_tumbling")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // timestamp_ntz surfaces as LocalDateTime in collected Rows
      val streamed = spark.table("file_tumbling").collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val expected = EventStreams.tumbling(batch, "1 hour").collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("Trigger.AvailableNow + watermark, append mode: emits exactly batch-minus-held-tail") {
    import spark.implicits._
    // same staged file-source shape as the complete-mode test above, but
    // run the way a production catch-up job runs: AvailableNow (process
    // everything, then stop) with APPEND output, where the watermark
    // decides which windows are final. The equivalence is exact and
    // two-sided: emitted == every batch window whose END the final
    // watermark passed; held == the trailing windows still in state —
    // the documented stream-vs-batch edge (DESIGN.md r9).
    val srcDir = java.nio.file.Files.createTempDirectory("evt_avnow")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      srcDir.resolve("events.parquet"))
    // watermarks require TIMESTAMP (tz-aware); the table's TIMESTAMP_NTZ
    // casts deterministically under the session's pinned UTC zone — the
    // same cast on both sides keeps the comparison exact
    val batch = graft.core.Tables.events(spark, sf0001)
      .withColumn("ts", $"ts".cast("timestamp"))
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    val streamRaw = spark.readStream.schema(raw.schema).parquet(srcDir.toString)
    val stream = (raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        streamRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => streamRaw
    }).withColumn("ts", col("ts").cast("timestamp"))
    val delay = "2 hours"
    val q = EventStreams.watermarkedTumbling(stream, delay, "1 hour")
      .writeStream.format("memory").queryName("avnow_tumbling")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "AvailableNow did not finish")
    finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))
    val emitted = spark.table("avnow_tumbling").collect().map(key).toSet
    // final watermark = max event time - delay; a window is emitted iff
    // its END <= watermark (wstart + 1h <= maxTs - 2h)
    val maxTs = batch.agg(max($"ts")).head().getTimestamp(0)
    val horizonMs = maxTs.getTime - 3L * 3600 * 1000 // delay + window width
    val all = EventStreams.tumbling(batch, "1 hour").collect()
    val expected = all.filter(
      _.getTimestamp(0).getTime <= horizonMs).map(key).toSet
    val held = all.map(key).toSet -- expected
    assert(emitted == expected,
      s"missing=${expected -- emitted} extra=${emitted -- expected}")
    assert(held.nonEmpty, "fixture never exercises the held-tail edge")
  }

  test("streaming dedup drops replayed events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[E]
    val q = EventStreams.dedupedStream(mem.toDF(), delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      mem.addData(mkEvents.take(3): _*) // replay (at-least-once delivery)
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == mkEvents.length)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[E]
    val q = EventStreams.enriched(mem.toDF(), dim, "user_id")
      .select($"event_id", $"tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      val out = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((1L, "gold"), (2L, "gold"), (4L, "gold"),
        (3L, "silver"), (5L, "silver")))
    } finally q.stop()
  }

  case class V(user_id: Long, ts: Timestamp, page: String)
  case class C(user_id: Long, ts: Timestamp, target: String)

  test("stream-stream interval join: attribution within the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[V]
    val clicks = MemoryStream[C]
    val joined = EventStreams.intervalJoin(
      views.toDF(), clicks.toDF(), key = "user_id",
      delay = "10 minutes", within = "15 minutes")
    val q = joined
      .select($"l_user_id", $"l_page", $"r_target", $"l_ts", $"r_ts")
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      views.addData(V(1, ts(0), "home"), V(2, ts(5), "search"))
      clicks.addData(
        C(1, ts(10), "ad-a"), // within 15m of user 1's view -> joins
        C(2, ts(25), "ad-b"), // 20m after user 2's view -> outside horizon
        C(3, ts(12), "ad-c")) // no matching view
      // advance watermark far enough to finalize append-mode output
      views.addData(V(9, ts(59), "late"))
      clicks.addData(C(9, ts(59), "late-click"))
      q.processAllAvailable()
      val rows = spark.table("attrib_out")
        .select($"l_user_id", $"l_page", $"r_target")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows.contains((1L, "home", "ad-a")))
      assert(!rows.exists(_._3 == "ad-b")) // outside the interval
      assert(!rows.exists(_._3 == "ad-c")) // no view to attribute
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer in STREAMING mode across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val q = EventStreams.statefulSessionize(mem.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append").start()
    try {
      mem.addData(EventStreams.Ev(1L, ts(0)), EventStreams.Ev(1L, ts(5)))
      q.processAllAvailable()
      mem.addData(EventStreams.Ev(1L, ts(50))) // 45-min gap closes session 1
      q.processAllAvailable()
      val closed = spark.table("fmgws_out").filter($"closed")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      assert(closed.toSeq == Seq((1L, "2026-01-01 10:00:00.0", 2L)))
    } finally q.stop()
  }

  test("event-time-timeout sessionizer closes idle sessions as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    val q = EventStreams.timeoutSessionize(
        mem.toDS().withWatermark("ts", "0 seconds"), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("timeout_out")
      .outputMode("append").start()
    try {
      mem.addData(EventStreams.Ev(1L, ts(0)), EventStreams.Ev(1L, ts(5)))
      q.processAllAvailable() // watermark ~10:05; session still open
      assert(spark.table("timeout_out").count() == 0)
      // a DIFFERENT key's late event pushes the watermark past 10:35 —
      // user 1 never sees another event, yet its session must close
      mem.addData(EventStreams.Ev(2L, Timestamp.valueOf("2026-01-01 12:00:00")))
      q.processAllAvailable()
      val closed = spark.table("timeout_out").filter($"closed")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      assert(closed.toSeq == Seq((1L, "2026-01-01 10:00:00.0", 2L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer (batch mode, O(1) state per key)") {
    import spark.implicits._
    val evs = mkEvents.map(e => EventStreams.Ev(e.user_id, e.ts)).toDS()
    val out = EventStreams.statefulSessionize(evs, gapMs = 30 * 60 * 1000)
      .collect().map(s => (s.user_id, s.session_start.toString, s.n_events)).toSet
    assert(out == Set(
      (1L, "2026-01-01 10:00:00.0", 2L),
      (1L, "2026-01-01 10:50:00.0", 1L),
      (2L, "2026-01-01 10:10:00.0", 1L),
      (2L, "2026-01-01 10:59:00.0", 1L)))
  }
}
