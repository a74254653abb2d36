package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — match records across two sources that
  * share no key, the cross-source counterpart of the dedup family
  * (reference analog: the datajoin tagged-join skeleton,
  * `hadoop-tools/hadoop-datajoin/.../DataJoinReducerBase.java`, which
  * only ever matches on EXACT keys; fuzzy linkage is beyond it).
  *
  * Shape: equi-join on blocking keys → cheap banded prefilter (length
  * difference bounds edit distance) → native codegen'd `levenshtein`
  * (no UDF) → per-right-record argmin via one window. All shuffles are
  * on the block key; there is no cross join anywhere.
  *
  * Scale notes (100 TB): the block key bounds the candidate set —
  * choose keys INVARIANT under the expected edits (here: nation, never
  * the name being edited); skewed blocks split like any skewed join
  * (AQE / salting, `ops/Skew.scala`). The window partitions by right-id
  * (state = one best row per record). For sub-block pruning at larger
  * blocks, compose with [[EditSimilarity]]'s PassJoin segments — same
  * lossless-filter contract.
  */
object EntityResolution {

  /** Best match per `b` record: block-join `a`×`b` on `blockCols`
    * (columns of BOTH inputs), keep pairs with
    * `levenshtein(aText, bText) <= maxDist`, and per `bId` keep the
    * (dist, aId)-smallest candidate. Inputs must carry disjoint
    * non-block column names. */
  def linkBest(a: DataFrame, b: DataFrame, blockCols: Seq[String],
               aId: String, bId: String, aText: String, bText: String,
               maxDist: Int): DataFrame = {
    val cand = b.join(a, blockCols)
      .filter(abs(length(col(aText)) - length(col(bText))) <= maxDist)
      .withColumn("dist", levenshtein(col(aText), col(bText)))
      .filter(col("dist") <= maxDist)
    val best = row_number().over(
      Window.partitionBy(col(bId)).orderBy(col("dist"), col(aId)))
    cand.withColumn("__rn", best).filter(col("__rn") === 1).drop("__rn")
  }
}
