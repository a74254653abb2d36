package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming CDC: maintain the live snapshot of a keyed table from a
  * change stream — the stream-side of [[graft.ops.Merge]]. Each key's
  * state is the single highest-version change seen so far (O(1) state
  * per key, the streaming analog of batch Merge's `max_by` aggregate);
  * every micro-batch emits the current resolution for the keys it
  * touched (row for insert/update, tombstone for delete), so an
  * update-mode sink converges to exactly the batch merge result no
  * matter how the feed is split into batches (CdcStreamsSpec pins
  * stream ≡ batch on a shared feed).
  *
  * Latest-wins ties break by (version, op, payload) — the same total
  * order batch Merge uses, so the two paths cannot disagree on
  * conflicting feeds.
  *
  * Scale: state is one small case class per live key, partitioned by
  * the stream's groupByKey shuffle; no windows, no corpus-wide joins.
  * Deletes keep a tombstone in state so a late lower-version update
  * cannot resurrect a deleted key; eviction of cold tombstones is the
  * retention policy of the surrounding pipeline (add a timeout if the
  * key space is unbounded).
  */
object CdcStreams {

  case class Change(k: Long, op: String, name: String, amount: Long, version: Long)
  case class SnapUpdate(k: Long, op: String, name: String, amount: Long,
                        version: Long) {
    def deleted: Boolean = op == "D"
  }

  /** The latest-wins total order — identical to batch Merge's
    * `max_by(struct(op, payload), struct(version, op, payload))`.
    * Strings compare as UTF-8 bytes (Catalyst's binary string order),
    * not Scala's UTF-16 code units — the two differ for strings mixing
    * supplementary-plane and U+E000..U+FFFF characters, and the batch
    * path is the authority. */
  private def cmpStr(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  private val changeOrd: Ordering[Change] = new Ordering[Change] {
    def compare(x: Change, y: Change): Int = {
      var c = java.lang.Long.compare(x.version, y.version)
      if (c == 0) c = cmpStr(x.op, y.op)
      if (c == 0) c = cmpStr(x.name, y.name)
      if (c == 0) c = java.lang.Long.compare(x.amount, y.amount)
      c
    }
  }

  private val updateOrd: Ordering[SnapUpdate] = new Ordering[SnapUpdate] {
    def compare(x: SnapUpdate, y: SnapUpdate): Int = {
      var c = java.lang.Long.compare(x.version, y.version)
      if (c == 0) c = cmpStr(x.op, y.op)
      if (c == 0) c = cmpStr(x.name, y.name)
      if (c == 0) c = java.lang.Long.compare(x.amount, y.amount)
      c
    }
  }

  /** Fold a change stream into per-key snapshot updates (update-mode
    * output). Works on a static Dataset too (same code path, one
    * "batch").
    *
    * `tombstoneRetentionMs` is the retention knob for unbounded key
    * spaces: when set, a key whose state is a tombstone arms a
    * processing-time timer; once it expires the tombstone is dropped
    * from state, so a LATER ingest of that key — any version — is
    * accepted fresh (CdcStreamsSpec pins it). That is the deliberate
    * trade every retention policy makes: out-of-order deliveries
    * straggling past the retention window can resurrect a deleted key,
    * so size the window to the feed's maximum disorder. Unset (the
    * default), tombstones are kept forever and resurrection is
    * impossible.
    *
    * Two operational notes when the knob is set: (1) Spark schedules
    * timer-check batches continuously under the default trigger — give
    * the query a processing-time trigger interval; and (2) after an
    * eviction the revived row's version may be LOWER than the forgotten
    * delete's, so downstream consumers must treat the update stream as
    * last-emission-wins per key (which keyed update-mode sinks already
    * do), not re-sort it by version. */
  def cdcSnapshot(changes: Dataset[Change],
                  tombstoneRetentionMs: Option[Long] = None): Dataset[SnapUpdate] = {
    import changes.sparkSession.implicits._
    val conf = if (tombstoneRetentionMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    changes.groupByKey(_.k)
      .flatMapGroupsWithState[Change, SnapUpdate](OutputMode.Update, conf) {
        (k, it, state) =>
          if (state.hasTimedOut) {
            // only tombstones arm the timer, but a live row can still see
            // a stale one (armed while deleted, then revived by a
            // higher-version change) — never drop live state on timeout
            if (state.getOption.exists(_.op == "D")) state.remove()
            Iterator.empty
          } else {
            val incoming = it.max(changeOrd)
            val best = state.getOption match {
              case Some(prev) if changeOrd.gteq(prev, incoming) => prev
              case _ => state.update(incoming); incoming
            }
            for (ms <- tombstoneRetentionMs if best.op == "D")
              state.setTimeoutDuration(ms)
            Iterator.single(SnapUpdate(k, best.op, best.name, best.amount, best.version))
          }
      }
  }

  // ---- SCD2 (history-maintaining) stream fold ----

  /** One validity interval of a key's history — the stream twin of a
    * [[graft.ops.Merge.applyChangesScd2]] output row. */
  case class HistRow(k: Long, name: String, amount: Long,
                     valid_from: Long, valid_to: Option[Long])

  /** A key's full corrected history as of one emission; `emit` is a
    * per-key sequence number, so "the latest emission per key" is the
    * converged history whatever order a sink retains rows in. */
  case class KeyHistory(k: Long, emit: Long, rows: Seq[HistRow])

  /** Per-key SCD2 stream state: the key's deduplicated change set plus
    * the emission counter. Public — Catalyst's encoder codegen (Janino)
    * cannot touch members of a non-public class. */
  case class Scd2State(changes: Seq[Change], emit: Long)

  /** The interval chain of a key's sorted change list: each change's row
    * is valid until the NEXT change's version (any op); a D closes the
    * chain without opening a row — identical semantics to batch
    * [[graft.ops.Merge.applyChangesScd2]]'s lead-window. */
  private[streaming] def intervalsOf(sorted: Seq[Change]): Seq[HistRow] =
    sorted.zipWithIndex.collect { case (c, i) if c.op != "D" =>
      HistRow(c.k, c.name, c.amount, c.version,
        if (i + 1 < sorted.length) Some(sorted(i + 1).version) else None)
    }

  /** Fold a change stream into SCD2 HISTORY — the history-maintaining
    * sibling of [[cdcSnapshot]]. State per key is its own change set
    * (deduplicated, so redelivery is idempotent) — the same cost bound
    * as the batch path, whose window also carries a key's full history;
    * an out-of-order change lands BETWEEN two known versions, closing
    * and reopening the surrounding intervals, so each batch re-emits the
    * key's whole corrected interval list rather than a delta.
    * CdcStreamsSpec pins: latest emission per key ≡ batch
    * `applyChangesScd2` over the same feed, under any batch split. */
  def cdcScd2(changes: Dataset[Change]): Dataset[KeyHistory] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .flatMapGroupsWithState[Scd2State, KeyHistory](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, it, state) =>
          val prev = state.getOption.getOrElse(Scd2State(Nil, 0L))
          val merged = (prev.changes ++ it).distinct.sorted(changeOrd)
          val next = Scd2State(merged, prev.emit + 1)
          state.update(next)
          Iterator.single(KeyHistory(k, next.emit, intervalsOf(merged)))
      }
  }

  /** Reduce emitted [[KeyHistory]] rows to the converged history (what a
    * keyed update-mode sink holds): latest emission per key, exploded.
    * Batch-side helper for tests/backfills. */
  def historyOf(updates: Dataset[KeyHistory]): Dataset[HistRow] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.k)
      .mapGroups { (_, it) => it.maxBy(_.emit) }
      .flatMap(_.rows)
  }

  /** Reduce emitted updates to the final snapshot (what an update-mode
    * keyed sink holds after the last batch): latest update per key by
    * the same total order, tombstones dropped. Batch-side helper for
    * tests/backfills. */
  def snapshotOf(updates: Dataset[SnapUpdate]): Dataset[(Long, String, Long)] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.k)
      .mapGroups { (_, it) =>
        it.max(updateOrd)
      }
      .filter(!_.deleted)
      .map(u => (u.k, u.name, u.amount))
  }
}
