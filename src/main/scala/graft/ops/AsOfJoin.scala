package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * right.time <= left.time on the same key — the temporal join Spark has
  * no native operator for (SURVEY.md §2.4 "not present in reference";
  * charter custom-operator list). Composed from built-ins, preference
  * (a): tag → union → one shuffle+sort per key → running last-non-null.
  *
  * Scale: this is the merge-join formulation — ONE exchange on the key
  * and one sort of |L|+|R| rows, no per-row range probe and no
  * quadratic candidate product (a broadcast-nested-loop `l.ts >= r.ts`
  * theta join would be |L|x|R|). State per window frame is one running
  * value; skewed keys split by AQE like any sort.
  *
  * Right side must be unique per (key, time) — pre-aggregate if not
  * (also what makes the semantics deterministic).
  */
object AsOfJoin {

  /** @param left       probe side (each row keeps its columns)
    * @param right      build side, unique per (key, time)
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param valueCols  right-side columns to carry (prefixed `asof_`)
    * @param inner      true drops left rows with no prior right row
    *                   (DuckDB ASOF JOIN default); false keeps them null
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, valueCols: Seq[String],
           inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag and align schemas: right rows sort BEFORE left rows at equal
    // time so right.ts == left.ts matches (<= semantics)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_isR", lit(0))
      .select(Seq(col(key).as("_k"), col("_t"), col("_isR")) ++
        leftCols.map(c => col(c).as(s"_l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_isR", lit(1))
      .select(Seq(col(key).as("_k"), col("_t"), col("_isR")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        valueCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r)
      .select((Seq(col("_k"), col("_t"), col("_isR")) ++
        leftCols.map(c => col(s"_l_$c")) ++
        valueCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c"))): _*)
      .filter(col("_isR") === 0)
    val out = merged.select(
      leftCols.map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(c => col(s"asof_$c")): _*)
    if (inner) out.filter(valueCols.map(c => col(s"asof_$c").isNotNull).reduce(_ || _))
    else out
  }
}
