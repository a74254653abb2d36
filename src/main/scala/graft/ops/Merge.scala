package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC merge: apply a change feed (insert / update / delete rows with a
  * version) onto a base snapshot — the incremental-maintenance primitive
  * a 100 TB corpus pipeline needs to avoid full rebuilds (the
  * MERGE INTO of Delta/Iceberg, composed from plain Spark operators).
  *
  * Plan shape, deliberately scale-safe:
  *   1. latest change per key via `max_by(struct(...), version)` — a
  *      hash aggregate with map-side partial merge (O(1) state per key
  *      per task), NOT a row_number window (which would sort whole
  *      partitions);
  *   2. one full-outer shuffle join base⟗latest on the key;
  *   3. per-row resolution: no change → base row; op D → dropped;
  *      op I/U → change row.
  * Two shuffles total, both on the merge key; AQE handles skew. Nothing
  * is collected, no windows over unbounded partitions.
  */
object Merge {

  /** Apply `changes` to `base`.
    *
    * @param base       current snapshot; must contain `keyCol` and every
    *                   column in `payloadCols`
    * @param changes    change feed with `keyCol`, `opCol` ('I' | 'U' |
    *                   'D'), `versionCol` (highest wins per key; ties
    *                   broken by op descending then payload for a
    *                   deterministic result), and `payloadCols`
    * @return the new snapshot with schema (keyCol, payloadCols*)
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String, versionCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    val latest = changes.groupBy(col(keyCol)).agg(
      max_by(
        struct((opCol +: payloadCols).map(col): _*),
        struct(col(versionCol), col(opCol),
          struct(payloadCols.map(col): _*))).as("__c"))

    val joined = base.join(latest, Seq(keyCol), "full_outer")
    val hasChange = col("__c").isNotNull
    val isDelete = hasChange && col("__c")(opCol) === "D"
    val outCols = col(keyCol) +: payloadCols.map { c =>
      when(hasChange, col("__c")(c)).otherwise(col(c)).as(c)
    }
    joined.filter(!isDelete).select(outCols: _*)
  }
}
