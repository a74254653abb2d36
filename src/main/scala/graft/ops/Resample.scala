package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a regular grid with forward fill — the
  * "gap fill" half of every telemetry/feature-store pipeline (the
  * reference's closest surface is the secondary-sort pattern of
  * `EX/SecondarySort.java`: group by key, order by time, walk; here the
  * walk is a Catalyst window, not reducer code):
  *
  *   1. bucket each observation to `floor(epoch / step) · step` and keep
  *      ONE value per (key, bucket) — the latest by event time
  *      (`max_by`, a partial-aggregable argmax: hot buckets collapse
  *      map-side, never serialize through one task),
  *   2. explode each key's `sequence(minBucket, maxBucket, step)` into
  *      the full grid — generated inline per row, no shuffle, no
  *      driver-side range materialization,
  *   3. left-join observations onto the grid and forward-fill with
  *      `last(..., ignoreNulls) OVER (PARTITION BY key ORDER BY bucket)`
  *      — per-key windows, so parallelism is the key count and no
  *      global-sort single partition exists anywhere in the plan
  *      (ResampleSpec pins the absence of a SinglePartition exchange).
  *
  * Forward fill carries raw observed values — no arithmetic touches
  * them — so the result is bit-exact across engines and the registered
  * query hash-checks against a DuckDB mirror. Determinism requires the
  * caller's (key, ts) to be unique (true for the events fixture at every
  * SF; pass a composite-unique ts otherwise).
  *
  * 100 TB notes: grid size is Σ_key span/step — output-sized, the same
  * as any resample's answer; state per window task is one running value.
  * The two shuffles (bucket agg, window) both key on the grouping
  * column; storing the observation table bucketed by key makes the
  * second one map-side.
  */
object Resample {

  /** Output: (k, bucket, v, n_obs) — one row per key per step in the
    * key's own observed span; `v` forward-filled, `n_obs` the raw
    * observation count in that bucket (0 = filled gap). */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: Column, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val b = events
      .select(col(keyCol).as("k"), col(tsCol).cast("timestamp").as("__ts"),
        valueCol.as("__v"))
      .withColumn("__u", unix_timestamp(col("__ts")))
      // floor division via pmod, exact in integer arithmetic: Spark's
      // `div` truncates toward zero, so pre-1970 timestamps (negative
      // epoch seconds) would bucket one step high and break the
      // cross-engine parity with the oracle's floor(epoch/step)
      .select(col("k"),
        expr(s"__u - pmod(__u, ${stepSeconds}L)").as("bucket"),
        col("__ts"), col("__v"))
      .groupBy("k", "bucket")
      .agg(max_by(col("__v"), col("__ts")).as("lastv"),
        count(lit(1)).as("n_obs"))
    val grid = b.groupBy("k")
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("k"),
        explode(sequence(col("mn"), col("mx"), lit(stepSeconds))).as("bucket"))
    val w = Window.partitionBy("k").orderBy("bucket")
    grid.join(b, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        last(col("lastv"), ignoreNulls = true).over(w).as("v"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
  }
}
