package graft.ops

import graft.SparkTestBase
import graft.core.Spread
import org.apache.spark.sql.functions._

/** [[graft.core.Spread]] — the input-split parallelism guard used by the
  * CPU-bound llm pipelines (shingle/signature builds, edit-distance
  * candidates). Three contracts:
  *  1. a narrow under-parallelized relation is repartitioned to the
  *     session's task slots (rows unchanged);
  *  2. a relation already at/above slot width passes through untouched
  *     (the 100 TB no-op branch);
  *  3. a WIDE plan (joins/aggregates upstream) is returned as-is without
  *     probing `.rdd` — the probe would EXECUTE the upstream adaptive
  *     stages at plan-construction time (measured as a duplicate
  *     pipeline run before the guard existed).
  */
class SpreadSpec extends SparkTestBase {
  import spark.implicits._

  test("under-parallelized narrow input is spread to the task slots") {
    val one = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      .withColumn("t", concat(lit("w"), col("id")))
    val out = Spread.toSlots(one)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.count() == 1000)
    assert(out.agg(sum("id")).as[Long].head() == 499500L)
  }

  test("input at or above slot width passes through with no new exchange") {
    val slots = spark.sparkContext.defaultParallelism
    val wideEnough = spark.range(0, 1000, 1, numPartitions = slots + 2).toDF("id")
    val out = Spread.toSlots(wideEnough)
    assert(out.rdd.getNumPartitions == slots + 2)
    assert(!out.queryExecution.executedPlan.toString.contains("RoundRobin"))
  }

  test("wide plans (join/aggregate upstream) are returned unchanged") {
    val a = spark.range(0, 50, 1, numPartitions = 1).toDF("id")
    val b = spark.range(0, 50, 1, numPartitions = 1).toDF("id")
    val joined = a.join(b, "id").groupBy(col("id") % 7 as "k")
      .agg(count(lit(1)).as("n"))
    val out = Spread.toSlots(joined)
    // same Dataset back: no repartition wrapped around the wide plan
    assert(out.queryExecution.logical eq joined.queryExecution.logical)
    assert(out.count() == 7)
  }
}
