package graft.core

import org.apache.spark.sql.DataFrame

/** Input-split parallelism guard (optimization guide §2.5/§6). CPU-bound
  * per-row pipelines (shingle/signature builds, per-pair verifies) fed
  * straight off a scan run only as wide as the scan has splits — a small
  * corpus parquet (one row group) is ONE task no matter how many cores
  * the session has, and parquet cannot split below row-group granularity
  * (measured: a single 1.45 s map task was the whole shingle+signature
  * build of the sf0.1 dedup queries on a 32-core session). Spreading the
  * projected relation across the session's task slots costs one exchange
  * of the rows the pipeline was going to read anyway; when the scan
  * already has at least as many splits as slots (any real 100 TB corpus),
  * the branch is a no-op — no extra shuffle at scale. */
object Spread {
  def toSlots(df: DataFrame): DataFrame = {
    // Guard: only narrow scan+project relations qualify. On a plan that
    // already contains a shuffle-inducing operator the output is
    // shuffle-partition-wide anyway, AND the `.rdd` probe below would
    // EXECUTE the upstream adaptive stages at plan-construction time
    // (AdaptiveSparkPlanExec materializes every query stage when the
    // RDD is requested) — measured as a full duplicate pipeline run.
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.analyzed.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Window | _: Distinct |
                _: Deduplicate | _: RepartitionOperation | _: Sort) => p
    }.isDefined
    if (wide) df
    else {
      val slots = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
    }
  }
}
