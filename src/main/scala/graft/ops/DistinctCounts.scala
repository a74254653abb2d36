package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType}

/** Distinct counting over a persisted SKETCH TABLE — the COUNT DISTINCT
  * analog of [[Quantiles.sketchTable]]/[[Quantiles.rollupQuantiles]].
  *
  * Why not `count(distinct x)`: at 100 TB an exact distinct is a full
  * shuffle of the distinct-key relation EVERY time the question is
  * asked, and distinct counts don't pre-aggregate (yesterday's count +
  * today's count ≠ the union's count — overlap is lost). The
  * [[graft.functions.HllSketch]] summary IS the reusable intermediate:
  * per-(group, unit) sketches persist once, union losslessly under any
  * regrouping, and stay EXACT while the union's cardinality sits under
  * the sparse bound (m/4 keys) — which is what makes the registry's
  * rollup query oracle-checkable against `count(DISTINCT …)` instead of
  * rows-only (see `DistinctSketch.scala`'s bijective-finalizer note).
  * Past the bound the sketch degrades to the classic ±1.04/√m estimate,
  * at a fixed 2^p bytes per group no matter the cardinality.
  *
  * Keying: integral columns pass through widened (the in-sketch fmix64
  * finalizer is bijective — exactness preserved unconditionally);
  * everything else is hashed to a long with codegen'd `xxhash64`
  * (distinctness preserved up to 64-bit collisions, i.e. in every
  * practical sense).
  */
object DistinctCounts {

  private[ops] def keyed(df: DataFrame, valueCol: Column): Column = {
    val dt = df.select(valueCol).schema.head.dataType
    dt match {
      case LongType | IntegerType | ShortType | ByteType => valueCol.cast("long")
      case DateType => valueCol.cast("int").cast("long") // days since epoch, bijective
      case _ => xxhash64(valueCol)
    }
  }

  /** One canonical sketch per (group, unit): persist these rows and
    * answer later distinct-count questions over any unit subset or
    * regrouping from them alone. Output: (g, u, sketch BINARY). */
  def sketchTable(
      df: DataFrame,
      groupCol: String,
      unitCol: String,
      valueCol: Column,
      p: Int = 14): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol).as("g"), col(unitCol).as("u"), keyed(df, valueCol).as("v"))
      .groupBy(col("g"), col("u"))
      .agg(call_function("graft_hll", col("v"), lit(p)).as("sketch"))
  }

  /** Distinct counts per group from a sketch table: `graft_hll_merge`
    * unions the per-unit summaries, `graft_hll_count` reads the result —
    * exact while the merged summary is still sparse. Output:
    * (g, n_distinct). */
  def rollupCounts(
      sketches: DataFrame,
      groupCol: String,
      sketchCol: String,
      p: Int = 14): DataFrame = {
    graft.functions.GraftFunctions.register(sketches.sparkSession)
    sketches
      .select(col(groupCol).as("g"), col(sketchCol).as("__sk"))
      .groupBy(col("g"))
      .agg(call_function("graft_hll_merge", col("__sk"), lit(p)).as("sk"))
      .select(col("g"), call_function("graft_hll_count", col("sk")).as("n_distinct"))
  }

  /** Direct per-group sketch count without the persisted table — one
    * partial-aggregated pass, O(2^p) state per group. */
  def sketchCounts(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      p: Int = 14): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol).as("g"), keyed(df, valueCol).as("v"))
      .groupBy(col("g"))
      .agg(call_function("graft_hll", col("v"), lit(p)).as("sk"))
      .select(col("g"), call_function("graft_hll_count", col("sk")).as("n_distinct"))
  }
}
