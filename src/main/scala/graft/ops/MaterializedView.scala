package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate materialized view — the
  * "don't re-run the job, fold the delta in" capability the reference
  * approximates by re-executing the whole aggregate job on base+delta
  * (its job chains have no incremental story; SURVEY.md §2.3). Classic
  * delta-propagation for distributive aggregates (Gupta & Mumick 1995,
  * "Maintenance of Materialized Views: Problems, Techniques, and
  * Applications", IEEE Data Eng. Bulletin):
  *
  *   MV' (k) = MV(k) ⊕ Δagg(k),  Δagg = Σ over the change feed with
  *   inserts weighted +1 and deletes −1; groups whose maintained row
  *   count reaches 0 vanish.
  *
  * COUNT and SUM are self-maintainable under insert+delete (no base
  * re-scan, ever); the spec pins that applying any split of a change
  * feed — one shot or repeatedly — lands bit-identical to a full
  * recompute, which is also exactly what makes the registered query
  * oracle-checkable: the oracle recomputes from scratch, the engine
  * maintains incrementally, and the hash gate demands equality.
  *
  * 100 TB design: the per-application cost is Δ-sized, not base-sized —
  * the delta aggregates first (one partial-agg shuffle over the feed,
  * map-side combine collapsing per-partition duplicates), then
  * full-outer-merges with the MV on the group key. With the MV stored
  * bucketed by `k` ([[Outputs.writeBucketedSorted]]) that merge reads
  * the MV shuffle-free and writes only changed buckets; nothing is
  * collected, nothing is base-sized. Contrast the recompute: a full
  * scan + full-vocabulary shuffle of the base EVERY refresh.
  */
object MaterializedView {

  /** Build the view: (k, n, s) = per-key row count and exact long sum
    * (money callers pass integer cents — see [[graft.queries.Ops]]). */
  def build(base: DataFrame, keyCol: String, valueCol: Column): DataFrame =
    base.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("s"))

  /** Fold a change feed into the view. `opCol` holds 'I' (insert) or
    * 'D' (delete); deleting a row not present in the base is the
    * caller's contract violation (counts go negative and the group is
    * dropped at 0 crossing, same as SQL MERGE semantics would). */
  def applyDelta(mv: DataFrame, delta: DataFrame,
                 keyCol: String, valueCol: Column, opCol: Column): DataFrame = {
    val sign = when(opCol === "I", 1L).otherwise(-1L)
    val dAgg = delta.groupBy(col(keyCol).as("k"))
      .agg(sum(sign).as("dn"), sum(sign * valueCol).as("ds"))
    mv.join(dAgg, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
  }
}
