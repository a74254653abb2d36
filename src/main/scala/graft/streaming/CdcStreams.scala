package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout
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
    * "batch"). */
  def cdcSnapshot(changes: Dataset[Change]): Dataset[SnapUpdate] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState[Change, SnapUpdate](GroupStateTimeout.NoTimeout) {
        (k, it, state) =>
          val incoming = it.max(changeOrd)
          val best = state.getOption match {
            case Some(prev) if changeOrd.gteq(prev, incoming) => prev
            case _ => state.update(incoming); incoming
          }
          SnapUpdate(k, best.op, best.name, best.amount, best.version)
      }
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
