package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.queries.Ops.cents

/** Structured-Streaming surface over the `events` schema (event_id, ts,
  * user_id, event_type, value, props) — beyond-reference extension
  * (SURVEY.md §2.11: the reference is pure batch; "Hadoop Streaming" is
  * stdin scripting). Every builder is a plain DataFrame transform, so the
  * SAME code runs in batch (oracle-checked in AnalyticsQueries) and on a
  * readStream/MemoryStream source (exercised in StreamingSpec) — the
  * Spark-first way to keep batch/streaming semantics aligned.
  *
  * Scale notes: windowed aggregation state is bounded by watermark
  * eviction ([[withWatermark]]); sessionization state per key is one
  * (start, last, count) triple, not the event list.
  */
object EventStreams {

  /** Tumbling event-time windows per event_type. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows (width, step) — each event lands in width/step
    * windows; partial aggregation still applies before the shuffle. */
  def sliding(events: DataFrame, width: String, step: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, step).as("w"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(col("w.start").as("wstart"), col("n"), col("sum_value"))

  /** Session windows per user: merge while the gap between consecutive
    * events is < gap; window end = last event + gap. */
  def sessionized(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Watermarked tumbling counts for streaming sources: late data beyond
    * `delay` is dropped and window state is evicted — bounded state at
    * unbounded input. */
  def watermarkedTumbling(events: DataFrame, delay: String, width: String): DataFrame =
    tumbling(events.withWatermark("ts", delay), width)

  /** Streaming exactly-once dedup: drop repeated event_ids within the
    * watermark horizon — the streaming face of the batch dedup surface
    * (state = one entry per id, evicted past the watermark). */
  def dedupedStream(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay).dropDuplicates("event_id", "ts")

  /** Stream-static enrichment join: the static side behaves like a
    * broadcast dimension (DistributedCache pattern, `CORE/mapreduce/
    * Job.java:1088`) against an unbounded stream. */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), key)

  /** STREAM-STREAM inner join with event-time interval bounds (e.g.
    * view→click attribution within a horizon). Both sides are
    * watermarked and the join condition bounds `r.ts` to
    * [l.ts, l.ts + within], so each side's join state is evicted once
    * the watermark passes the interval — without the time bound the
    * state store grows with the full history of both streams. Input
    * frames must expose (`key`, ts) plus their payload columns; the left
    * side's columns are prefixed `l_`, the right's `r_` to keep the
    * output schema unambiguous. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   delay: String, within: String): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withWatermark("l_ts", delay)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark("r_ts", delay)
    l.join(r, expr(
      s"l_$key = r_$key AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL $within"))
  }

  // ---- custom state: mapGroupsWithState sessionizer ----

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        n_events: Long, closed: Boolean)

  /** Streaming sessionizer with EVENT-TIME TIMEOUT: sessions close when
    * the watermark passes last_event + gap even if the key never sees
    * another event — the piece a gap-check-on-next-event sessionizer
    * ([[statefulSessionize]]) cannot provide. Requires a watermarked
    * input; emits ONLY closed sessions (exactly-once, no per-batch
    * duplicates in append mode). */
  def timeoutSessionize(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          if (state.hasTimedOut) {
            val st = state.get
            out += SessionOut(uid, new java.sql.Timestamp(st.start), st.n, closed = true)
            state.remove()
          } else {
            val sorted = evs.map(_.ts.getTime).toSeq.sorted
            var st = state.getOption.getOrElse(SessionState(-1, -1, 0))
            sorted.foreach { t =>
              st = if (st.n == 0 || t - st.last >= gapMs) {
                if (st.n > 0)
                  out += SessionOut(uid, new java.sql.Timestamp(st.start), st.n, closed = true)
                SessionState(t, t, 1)
              } else SessionState(st.start, t, st.n + 1)
            }
            if (st.n > 0) {
              state.update(st)
              // close when the event-time watermark passes last + gap
              state.setTimeoutTimestamp(st.last + gapMs)
            }
          }
          out.iterator
      }
  }

  /** Custom stateful sessionizer via flatMapGroupsWithState — the escape
    * hatch for session semantics `session_window` can't express (e.g.
    * emitting per-event deltas or capping session length). State per user
    * is O(1); a processing-time timeout closes idle sessions. */
  def statefulSessionize(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // batch mode: all events for the key arrive at once, sorted here
          val sorted = evs.map(_.ts.getTime).toSeq.sorted
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var st = state.getOption.getOrElse(SessionState(-1, -1, 0))
          sorted.foreach { t =>
            st = if (st.n == 0 || t - st.last >= gapMs) {
              if (st.n > 0)
                out += SessionOut(uid, new java.sql.Timestamp(st.start), st.n, closed = true)
              SessionState(t, t, 1)
            } else SessionState(st.start, t, st.n + 1)
          }
          if (st.n > 0) {
            out += SessionOut(uid, new java.sql.Timestamp(st.start), st.n, closed = false)
            state.update(st)
          }
          out.iterator
      }
  }
}
