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

  /** SCD type-2: apply the change feed as HISTORY — every version of a
    * key is kept as a row with a validity interval `[valid_from,
    * valid_to)` (`valid_to` NULL = current), instead of [[applyChanges]]'
    * overwrite. The temporal-warehouse primitive: "what did this row say
    * at version v" stays answerable forever.
    *
    * Semantics: a key's first change closes its current history row at
    * that change's version; each I/U change opens a row valid from its
    * version until the key's next change (any op); a D closes the
    * interval chain without opening one (the key has no current row
    * until a later I/U revives it).
    *
    * Plan shape: the `lead` window runs over the CHANGE FEED partitioned
    * by key — per-key state is the one-row lookahead of a streaming
    * frame, and a key's cost is its own change history (which is also
    * its output size, so no formulation does better); the snapshot
    * itself is never windowed. Plus one partial-agg (min version per
    * key) and one shuffle join against the current rows.
    *
    * `history` must carry `keyCol`, `payloadCols`, `valid_from`,
    * `valid_to`; versions must be unique per (key, version, op).
    */
  def applyChangesScd2(history: DataFrame, changes: DataFrame, keyCol: String,
                       opCol: String, versionCol: String,
                       payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol), col(opCol))
    val seq = changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
    val newRows = seq.filter(col(opCol) =!= "D")
      .select((col(keyCol) +: payloadCols.map(col)) ++
        Seq(col("valid_from"), col("valid_to")): _*)

    val firstV = changes.groupBy(col(keyCol))
      .agg(min(col(versionCol)).as("__first_v"))
    val current = history.filter(col("valid_to").isNull)
      .join(firstV, Seq(keyCol), "left")
      .withColumn("valid_to", col("__first_v")) // NULL when key untouched
      .drop("__first_v")
    val past = history.filter(col("valid_to").isNotNull)

    past.unionByName(current).unionByName(newRows)
  }

  /** Time-travel read over an SCD2 history: the snapshot as of version
    * `v` — rows whose validity interval contains `v`. A plain filter, so
    * it pushes down to the scan; over a history partitioned/clustered by
    * interval bounds it prunes files too. `snapshotAsOf(scd2History, v)`
    * equals `applyChanges` run with only the changes `<= v` — pinned in
    * MergeSpec. */
  def snapshotAsOf(history: DataFrame, v: Long): DataFrame =
    history.filter(col("valid_from") <= v &&
        (col("valid_to").isNull || col("valid_to") > v))
      .drop("valid_from", "valid_to")
}
