package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete quantiles, built for the "few groups, huge n"
  * shape that breaks the naive construction at scale.
  *
  * The textbook plan — `row_number() OVER (PARTITION BY group ORDER BY v)`
  * on the raw relation — sorts ALL rows inside as many tasks as there are
  * groups: with 3 statuses over 100 TB that is 3 tasks doing everything.
  * Here the only operation that sees data volume is a map-side-combined
  * `groupBy (group, value) -> count`; the window (cumulative count and
  * group total) runs on the DISTINCT-VALUE relation, whose size is
  * bounded by value cardinality, not row count — for integer-cents money,
  * token counts, lengths etc. that is orders of magnitude smaller and
  * task-skew-proof in practice. The reference computes its median the
  * same conceptual way (histogram then scan — `EX/WordMedian.java:121`)
  * but single-threaded in the driver; this is the distributed form.
  *
  * Rank selection is pure integer arithmetic: the p = num/den quantile is
  * the value covering rank `ceil(p·n) = (num·n + den − 1) div den` in the
  * cumulative count — no floating point anywhere, so a SQL oracle agrees
  * bit-for-bit by construction (discrete/lower quantile semantics: the
  * smallest value whose cumulative count reaches the rank).
  */
object Quantiles {

  /** Quantile specs are (label, num, den) with 1 <= num <= den: p = num/den.
    * Output: one row per (group, label) — (g, p, v). */
  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      specs: Seq[(String, Int, Int)]): DataFrame = {
    val byVal = df
      .select(col(groupCol).as("g"), valueCol.as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    rankSelect(byVal, specs)
  }

  /** Approximate quantiles from the one-pass [[graft.functions.KllSketch]]
    * aggregate: state per group is O(k·log(n/k)) regardless of value
    * CARDINALITY — the regime where [[exactQuantiles]]'s distinct-value
    * shuffle stops being small (raw timestamps, scores, byte sizes).
    * The sketch's weighted CDF feeds the SAME integer-rank selection as
    * the exact path, so the two differ only in the multiset they rank
    * over; KllSpec pins the rank error and the exact-below-k case. */
  def approxQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      specs: Seq[(String, Int, Int)],
      k: Int = 512): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val byVal = df
      .select(col(groupCol).as("g"), valueCol.as("v"))
      .groupBy(col("g"))
      .agg(call_function("graft_kll", col("v"), lit(k)).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      // equal values can appear at several sketch levels — re-coalesce
      // so the CDF has one row per (group, value) like the exact path
      .groupBy(col("g"), col("e.v").as("v"))
      .agg(sum(col("e.w")).as("cnt"))
    rankSelect(byVal, specs)
  }

  /** The rows of a SKETCH TABLE: one KLL summary per (group, unit) —
    * persist these (unit = day / source / file) and answer later
    * quantile queries over any unit subset or regrouping from the tiny
    * sketch rows alone, raw data never re-scanned. The 100 TB
    * pre-aggregation pattern: a year of per-day sketches is ~365·k·log n
    * longs per group, and [[rollupQuantiles]] over them is metadata-
    * sized work. Output: (g, u, sketch). */
  def sketchTable(
      df: DataFrame,
      groupCol: String,
      unitCol: String,
      valueCol: Column,
      k: Int = 512): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol).as("g"), col(unitCol).as("u"), valueCol.as("v"))
      .groupBy(col("g"), col("u"))
      .agg(call_function("graft_kll", col("v"), lit(k)).as("sketch"))
  }

  /** Quantiles from a sketch table: `graft_kll_merge` re-aggregates the
    * FINALIZED per-unit summaries (each weighted atom re-enters at its
    * level, reconstructing the compactor structure — see
    * [[graft.functions.KllMergeSketch]]), then the same integer-rank
    * selection as the exact path runs on the merged CDF. */
  def rollupQuantiles(
      sketches: DataFrame,
      groupCol: String,
      sketchCol: String,
      specs: Seq[(String, Int, Int)],
      k: Int = 512): DataFrame = {
    graft.functions.GraftFunctions.register(sketches.sparkSession)
    val byVal = sketches
      .select(col(groupCol).as("g"), col(sketchCol).as("__sk"))
      .groupBy(col("g"))
      .agg(call_function("graft_kll_merge", col("__sk"), lit(k)).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .groupBy(col("g"), col("e.v").as("v"))
      .agg(sum(col("e.w")).as("cnt"))
    rankSelect(byVal, specs)
  }

  /** Shared tail: cumulative counts over the (g, v, cnt) relation and
    * integer-arithmetic rank selection. The window input is the
    * compressed multiset (distinct values or sketch atoms), never raw
    * rows. */
  private def rankSelect(
      byVal: DataFrame,
      specs: Seq[(String, Int, Int)]): DataFrame = {
    require(specs.nonEmpty, "at least one quantile spec required")
    specs.foreach { case (label, num, den) =>
      require(num >= 1 && num <= den, s"$label: need 1 <= num <= den, got $num/$den")
    }
    val spark = byVal.sparkSession
    import spark.implicits._

    val cum = byVal
      .withColumn("hi", sum(col("cnt")).over(Window.partitionBy("g").orderBy("v")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("g")))

    // 5-ish rows — broadcast; the BETWEEN join is a nested loop against
    // a relation of constant size, i.e. a map-side filter in practice
    val specDf = specs.toDF("p", "num", "den")
    cum.join(broadcast(specDf),
        expr("(num * n + den - 1) div den")
          .between(col("hi") - col("cnt") + 1, col("hi")))
      .select(col("g"), col("p"), col("v"))
  }
}
