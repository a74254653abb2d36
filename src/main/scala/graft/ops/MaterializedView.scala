package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate materialized view — the
  * "don't re-run the job, fold the delta in" capability the reference
  * approximates by re-executing the whole aggregate job on base+delta
  * (its job chains have no incremental story; SURVEY.md §2.3). Classic
  * delta-propagation for distributive aggregates (Gupta & Mumick 1995,
  * "Maintenance of Materialized Views: Problems, Techniques, and
  * Applications", IEEE Data Eng. Bulletin):
  *
  *   MV' (k) = MV(k) ⊕ Δagg(k),  Δagg = Σ over the change feed with
  *   inserts weighted +1 and deletes −1; groups whose maintained row
  *   count reaches 0 vanish.
  *
  * COUNT and SUM are self-maintainable under insert+delete (no base
  * re-scan, ever); the spec pins that applying any split of a change
  * feed — one shot or repeatedly — lands bit-identical to a full
  * recompute, which is also exactly what makes the registered query
  * oracle-checkable: the oracle recomputes from scratch, the engine
  * maintains incrementally, and the hash gate demands equality.
  *
  * 100 TB design: the per-application cost is Δ-sized, not base-sized —
  * the delta aggregates first (one partial-agg shuffle over the feed,
  * map-side combine collapsing per-partition duplicates), then
  * full-outer-merges with the MV on the group key. With the MV stored
  * bucketed by `k` ([[Outputs.writeBucketedSorted]]) that merge reads
  * the MV shuffle-free and writes only changed buckets; nothing is
  * collected, nothing is base-sized. Contrast the recompute: a full
  * scan + full-vocabulary shuffle of the base EVERY refresh.
  */
object MaterializedView {

  /** Build the view: (k, n, s) = per-key row count and exact long sum
    * (money callers pass integer cents — see [[graft.queries.Ops]]). */
  def build(base: DataFrame, keyCol: String, valueCol: Column): DataFrame =
    base.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("s"))

  /** Fold a change feed into the view. `opCol` holds 'I' (insert) or
    * 'D' (delete); deleting a row not present in the base is the
    * caller's contract violation (counts go negative and the group is
    * dropped at 0 crossing, same as SQL MERGE semantics would). */
  def applyDelta(mv: DataFrame, delta: DataFrame,
                 keyCol: String, valueCol: Column, opCol: Column): DataFrame =
    merge(mv, deltaAgg(delta, keyCol, valueCol, opCol))

  /** Δ pre-aggregation: one partial-agg shuffle over the feed. */
  private def deltaAgg(delta: DataFrame, keyCol: String, valueCol: Column,
                       opCol: Column): DataFrame = {
    val sign = when(opCol === "I", 1L).otherwise(-1L)
    delta.groupBy(col(keyCol).as("k"))
      .agg(sum(sign).as("dn"), sum(sign * valueCol).as("ds"))
  }

  /** The ⊕ fold — shared by the in-memory and bucketed paths so both
    * produce bit-identical arithmetic. */
  private def merge(mv: DataFrame, dAgg: DataFrame): DataFrame =
    mv.join(dAgg, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)

  // ---- the DURABLE bucketed lifecycle: the stored-table form of the
  // scaladoc's 100 TB claim, demonstrated rather than asserted ----

  private def withPart(mv: DataFrame, nParts: Int): DataFrame =
    mv.withColumn("p", pmod(xxhash64(col("k")), lit(nParts.toLong)))

  /** Materialize the view as a managed table partitioned by
    * `p = pmod(xxhash64(k), nParts)` and bucketed+sorted by `k` inside
    * each partition ([[Outputs.writeBucketedSorted]]). The two layout
    * axes serve the two refresh costs: bucketing makes the merge read
    * the MV WITHOUT a shuffle (the scan reports hash-partitioning on k,
    * so only the Δ side exchanges — MvBucketedSpec pins one Exchange in
    * the plan), and partitioning makes the write touch ONLY the
    * directories whose keys changed (dynamic partition overwrite —
    * untouched partitions keep their exact files, also spec-pinned). */
  def buildBucketed(base: DataFrame, keyCol: String, valueCol: Column,
                    table: String, nBuckets: Int = 16, nParts: Int = 16): Unit =
    Outputs.writeBucketedSorted(
      withPart(build(base, keyCol, valueCol), nParts),
      table, nBuckets, "k", partitionCol = Some("p"))

  /** The refresh's merge relation plus the changed-partition list —
    * exposed so MvBucketedSpec can pin the plan shape (single Exchange,
    * bucketed scan, partition filters) without duplicating the logic. */
  def bucketedRefreshPlan(spark: SparkSession, table: String, delta: DataFrame,
                          keyCol: String, valueCol: Column, opCol: Column,
                          nParts: Int = 16): (DataFrame, Seq[Long]) = {
    val dAgg = deltaAgg(delta, keyCol, valueCol, opCol)
    // the changed-partition list is ≤ nParts values by construction —
    // a bounded driver collect, the same contract as a partition prune
    val changed = withPart(dAgg, nParts).select(col("p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val cur = spark.table(table)
      .filter(col("p").isInCollection(changed)).drop("p")
    (withPart(merge(cur, dAgg), nParts), changed)
  }

  // ---- pristine-copy support: the production refresh CADENCE ----
  // A long-lived MV is built once and then lives in Δ-refresh cycles:
  // restore/accept yesterday's state, fold today's delta. These helpers
  // let a caller (and the bench) pay exactly that steady-state cost —
  // the build happens once into a durable pristine copy; each cycle is
  // two Δ-sized partition operations, never a base re-scan.

  /** Materialize the freshly-built view once as a `p`-partitioned
    * parquet copy — the durable "yesterday" the Δ-cycles reset from. */
  def savePristine(base: DataFrame, keyCol: String, valueCol: Column,
                   path: String, nParts: Int = 16): Unit =
    withPart(build(base, keyCol, valueCol), nParts)
      .write.partitionBy("p").parquet(path)

  /** First-time table seed from the pristine copy (no base scan). */
  def seedFromPristine(spark: SparkSession, path: String, table: String,
                       nBuckets: Int = 16): Unit =
    Outputs.writeBucketedSorted(spark.read.parquet(path), table, nBuckets,
      "k", partitionCol = Some("p"))

  /** Reset exactly the partitions `delta` is about to touch back to the
    * pristine state — Δ-sized (dynamic partition overwrite over the
    * changed-partition list; untouched partitions keep their files).
    * Also heals a crashed previous cycle: any partition a half-applied
    * refresh corrupted is in the same changed set and gets rewritten. */
  def restoreChanged(spark: SparkSession, table: String, path: String,
                     delta: DataFrame, keyCol: String, valueCol: Column,
                     opCol: Column, nParts: Int = 16,
                     nBuckets: Int = 16): Unit = {
    val dAgg = deltaAgg(delta, keyCol, valueCol, opCol)
    val changed = withPart(dAgg, nParts).select(col("p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.read.parquet(path)
      .filter(col("p").isInCollection(changed))
      .select("k", "n", "s", "p")
      .repartition(nBuckets, col("k")) // bucket-aligned: one file per (p, bucket)
      .write.mode("overwrite").insertInto(table)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  /** One full steady-state Δ-cycle — [[restoreChanged]] then the
    * [[refreshBucketed]] fold — with the change feed aggregated ONCE:
    * the two phases need the identical Δ-aggregate and changed-partition
    * list, and calling them separately re-ran the feed aggregation and
    * its driver collect per phase (the feed itself is scanned twice).
    * Same writes, same healing semantics, half the Δ-side jobs. */
  def refreshCycle(spark: SparkSession, table: String, path: String,
                   delta: DataFrame, keyCol: String, valueCol: Column,
                   opCol: Column, nParts: Int = 16,
                   nBuckets: Int = 16): Unit = {
    val dAgg = deltaAgg(delta, keyCol, valueCol, opCol).persist()
    try {
      val changed = withPart(dAgg, nParts).select(col("p")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        spark.read.parquet(path)
          .filter(col("p").isInCollection(changed))
          .select("k", "n", "s", "p")
          .repartition(nBuckets, col("k")) // bucket-aligned (see restoreChanged)
          .write.mode("overwrite").insertInto(table)
        val cur = spark.table(table)
          .filter(col("p").isInCollection(changed)).drop("p")
        val merged = withPart(merge(cur, dAgg), nParts).persist()
        try {
          merged.select("k", "n", "s", "p")
            .repartition(nBuckets, col("k"))
            .write.mode("overwrite")
            .insertInto(table)
          val present = merged.select(col("p")).distinct()
            .collect().map(_.getLong(0)).toSet
          val emptied = changed.filterNot(present)
          if (emptied.nonEmpty) {
            val loc = Outputs.managedLocation(spark, table)
            val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            emptied.foreach(p =>
              fs.delete(new org.apache.hadoop.fs.Path(loc, s"p=$p"), true))
            spark.sql(s"REFRESH TABLE $table")
          }
        } finally merged.unpersist()
      } finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)
    } finally dAgg.unpersist()
  }

  /** Fold a change feed into the STORED view, Δ-sized end to end: reads
    * only the changed partitions (partition filter) shuffle-free on the
    * MV side (bucketed scan), rewrites only those partitions (dynamic
    * overwrite), and clears partitions the deletes emptied — dynamic
    * overwrite cannot express "this partition is now empty", so those
    * directories are removed explicitly. */
  def refreshBucketed(spark: SparkSession, table: String, delta: DataFrame,
                      keyCol: String, valueCol: Column, opCol: Column,
                      nParts: Int = 16, nBuckets: Int = 16): Unit = {
    val (merged0, changed) = bucketedRefreshPlan(
      spark, table, delta, keyCol, valueCol, opCol, nParts)
    val merged = merged0.persist() // Δ+changed-partition sized; read twice
    try {
      val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try merged.select("k", "n", "s", "p")
        .repartition(nBuckets, col("k")) // bucket-aligned (see restoreChanged)
        .write.mode("overwrite")
        .insertInto(table)
      finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
      val present = merged.select(col("p")).distinct()
        .collect().map(_.getLong(0)).toSet
      val emptied = changed.filterNot(present)
      if (emptied.nonEmpty) {
        val loc = Outputs.managedLocation(spark, table)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach(p =>
          fs.delete(new org.apache.hadoop.fs.Path(loc, s"p=$p"), true))
        spark.sql(s"REFRESH TABLE $table")
      }
    } finally merged.unpersist()
  }
}
