package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

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
    * `max_by(struct(op, payload), struct(version, op, payload))`. */
  private def ord(c: Change): (Long, String, String, Long) =
    (c.version, c.op, c.name, c.amount)

  /** Fold a change stream into per-key snapshot updates (update-mode
    * output). Works on a static Dataset too (same code path, one
    * "batch"). */
  def cdcSnapshot(changes: Dataset[Change]): Dataset[SnapUpdate] = {
    import changes.sparkSession.implicits._
    import scala.math.Ordering.Implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState[Change, SnapUpdate](GroupStateTimeout.NoTimeout) {
        (k, it, state) =>
          val incoming = it.maxBy(ord)
          val best = state.getOption match {
            case Some(prev) if ord(prev) >= ord(incoming) => prev
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
        it.maxBy(u => (u.version, u.op, u.name, u.amount))
      }
      .filter(!_.deleted)
      .map(u => (u.k, u.name, u.amount))
  }
}
