package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-frequency queries over a persisted SKETCH TABLE — the
  * "how often did key k occur?" analog of [[DistinctCounts]] (distinct
  * counts) and [[Quantiles]] (quantiles), backed by
  * [[graft.functions.CmsSketch]] (Count-Min with an exact sparse mode).
  *
  * Why not `count(*) GROUP BY key`: at 100 TB the exact answer is a
  * full-vocabulary shuffle EVERY time a frequency question is asked, and
  * the per-key counts can't pre-aggregate into bounded state. The CM
  * summary is the bounded reusable intermediate: per-(group, unit)
  * sketches persist once (d·w counters each, forever), merge losslessly
  * by counter addition under any regrouping, and answer any point query
  * in O(d). While the merged summary's distinct-key count sits under the
  * sparse bound (w/4) the answer is EXACT — the regime the registry
  * query is oracle-checked in; past it, the classic CM guarantee holds:
  * never an undercount, overcount ≤ e/w·N with probability 1 − e^−d.
  *
  * Keying follows [[DistinctCounts.keyed]]: integral columns pass
  * through bijectively, everything else via codegen'd `xxhash64`.
  */
object FreqCounts {

  /** One canonical frequency sketch per group — a single
    * partial-aggregated pass, O(d·w) state per group. Output:
    * (g, sketch BINARY). */
  def sketchCounts(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      d: Int = 3,
      w: Int = 16384): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol).as("g"), DistinctCounts.keyed(df, valueCol).as("v"))
      .groupBy(col("g"))
      .agg(call_function("graft_cms", col("v"), lit(d), lit(w)).as("sketch"))
  }

  /** Union per-group summaries back into coarser groups (or one global
    * row with `lit(1)` as the regroup key): counter addition, lossless
    * w.r.t. sketch semantics. Output: (g, sketch). */
  def rollupSketches(
      sketches: DataFrame,
      groupCol: Column,
      sketchCol: Column,
      d: Int = 3,
      w: Int = 16384): DataFrame = {
    graft.functions.GraftFunctions.register(sketches.sparkSession)
    sketches
      .select(groupCol.as("g"), sketchCol.as("__sk"))
      .groupBy(col("g"))
      .agg(call_function("graft_cms_merge", col("__sk"), lit(d), lit(w)).as("sketch"))
  }

  /** Frequency of each probe key against each sketch row. `probes` is a
    * small relation (keys the caller cares about) broadcast against the
    * handful of sketch rows. Output: sketch columns + (key, freq) — `key`
    * carries the caller's raw probe value; the sketch is probed with the
    * SAME [[DistinctCounts.keyed]] transform the build side used, so
    * string-keyed sketches answer correctly instead of silently returning
    * 0 for raw-value probes. */
  def pointQueries(
      sketches: DataFrame,
      sketchCol: Column,
      probes: DataFrame,
      probeKey: Column): DataFrame = {
    graft.functions.GraftFunctions.register(sketches.sparkSession)
    val p = probes.select(probeKey.as("key"),
      DistinctCounts.keyed(probes, probeKey).as("__probe_k"))
    sketches.crossJoin(broadcast(p))
      .withColumn("freq",
        call_function("graft_cms_query", sketchCol, col("__probe_k")))
      .drop("__probe_k")
  }
}
