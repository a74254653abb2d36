package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucket table layout for SHUFFLE-FREE co-clustered joins — the
  * Spark-native form of the reference's map-side join over identically
  * partitioned inputs (CORE/…/lib/join/CompositeInputFormat.java:56,
  * which joins pre-partitioned sorted files partition-by-partition with
  * no shuffle at all).
  *
  * `commitBucketed` rewrites a snapshot table with every row routed to
  * `pmod(hash(key), n)` and each bucket written as its own file(s) under
  * a `__graft_bucket=<k>/` path segment; the commit records
  * `#layout=bucket,<n>,<key>` in the manifest header. The DSv2 scan then
  * reports `KeyGroupedPartitioning(bucket(n, key))` with one keyed input
  * partition per bucket, so two tables bucketed with the same (key
  * type, n) join with ZERO Exchange on either side — Spark's
  * storage-partitioned join. At 100 TB a fact-fact join is the most
  * expensive plan a user runs; this removes both full-table shuffles
  * from it.
  *
  * The hash contract: bucket id = `pmod(hash(key), n)` where `hash` is
  * Spark's codegen'd Murmur3 (seed 42) — the write side computes it with
  * `functions.hash`, and the catalog's `bucket` V2 function
  * ([[graft.sources.v2.BucketFunction]]) reproduces it interpretively,
  * so the two can never disagree (NULL hashes to the seed on both
  * sides).
  *
  * Layout lifecycle is CONSERVATIVE: only `commitBucketed` publishes the
  * layout header, and every other commit (append, DML, compaction,
  * cluster) drops it — new files without a bucket path would break the
  * co-partitioning guarantee, so the table silently degrades to ordinary
  * shuffled joins until `CALL system.bucket` runs again. Correctness
  * never depends on the layout; it is purely a plan improvement.
  */
object BucketLayout {

  /** A bucket layout: `key` column hashed into `buckets` groups. */
  final case class Spec(column: String, buckets: Int)

  private val DirPrefix = "__graft_bucket="
  private val PathRe = """__graft_bucket=(\d+)""".r

  def format(spec: Spec): String = s"bucket,${spec.buckets},${spec.column}"

  def parse(s: String): Option[Spec] = s.split(",", 3) match {
    case Array("bucket", n, col) if n.forall(_.isDigit) && col.nonEmpty =>
      Some(Spec(col, n.toInt))
    case _ => None
  }

  /** The bucket id expression the WRITER uses — Spark's codegen'd
    * Murmur3 (`functions.hash`, seed 42) mod n; must stay in lockstep
    * with [[graft.sources.v2.BucketFunction]]'s interpreted twin. */
  def bucketId(key: Column, n: Int): Column = pmod(hash(key), lit(n))

  /** The bucket a data file belongs to, parsed from its
    * `__graft_bucket=<k>` path segment — None for a non-bucketed file
    * (which deactivates the layout for the whole version). */
  private[graft] def bucketOfPath(file: String): Option[Int] =
    PathRe.findFirstMatchIn(file).map(_.group(1).toInt)

  /** THE bucket-routed write: rows hashed to `spec` buckets, one file
    * per non-empty bucket under `__graft_bucket=<k>/`, key-sorted
    * within. One recipe shared by build/append/fold so the routing
    * contract (hash, sort, dir prefix) can never diverge between them.
    * Repartition ON the bucket column so the dynamic-partition write
    * sees each bucket in exactly one task → one file per bucket, not
    * one per (task × bucket). Sort by (bucket, key): the dynamic-
    * partition writer REQUIRES its input sorted by the partition column
    * and would otherwise insert its own sort on the bucket alone —
    * non-stable, destroying the key order inside each file that
    * [[graft.sources.v2.SnapshotRowScan.outputOrdering]] reports.
    * Returns the written files. */
  private def writeBucketed(df: org.apache.spark.sql.DataFrame, spec: Spec,
                            dataDir: Path): Seq[String] = {
    val b = "__graft_bucket"
    df.withColumn(b, bucketId(col(spec.column), spec.buckets))
      .repartition(spec.buckets, col(b))
      .sortWithinPartitions(col(b), col(spec.column))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy(b).parquet(dataDir.toString)
    val f = dataDir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    f.globStatus(new Path(dataDir, s"$DirPrefix*/part-*"))
      .toSeq.map(_.getPath.toString)
  }

  /** APPEND under the table's existing bucket layout — continuous
    * co-clustered ingest. The batch is routed with the SAME hash recipe
    * the layout was built with (one batch-sized shuffle, one file per
    * non-empty bucket, key-sorted within), so [[Snapshots.publishAppend]]
    * carries the `#layout=` header and co-partitioned joins stay
    * shuffle-free across ingestion: at 100 TB the fact table keeps its
    * zero-Exchange join plan WITHOUT re-bucketing the table per batch
    * (cost is O(batch), never O(table)). Buckets accumulate one file per
    * append until `CALL system.bucket` folds them back to one (the scan
    * groups same-bucket files for SPJ meanwhile, and stops reporting
    * per-bucket sortedness while any bucket holds several files —
    * merge joins re-insert their Sort, the join stays Exchange-free). */
  def appendBucketed(s: SparkSession, loc: String,
                     df: org.apache.spark.sql.DataFrame,
                     marker: Option[String] = None): Long = {
    val spec = Snapshots.versionLayout(s, loc,
        Snapshots.latestVersion(s, loc)).flatMap(parse)
      .getOrElse(throw new IllegalStateException(
        s"$loc has no active bucket layout — run commitBucketed " +
          "(CALL <cat>.system.bucket) first, or use a plain append"))
    val table = Snapshots.read(s, loc)
    require(df.columns.sorted.sameElements(table.columns.sorted),
      s"appendBucketed batch columns ${df.columns.mkString(",")} must match " +
        s"the table's ${table.columns.mkString(",")} exactly (additive " +
        "evolution goes through commitAppend, which drops the layout)")
    val dataDir = new Path(loc, s"data/${java.util.UUID.randomUUID()}")
    val f = dataDir.getFileSystem(s.sparkContext.hadoopConfiguration)
    val newFiles = writeBucketed(df, spec, dataDir)
    // marker (if any) rides in the publishing manifest — the same
    // exactly-once contract commitAppend gives streaming epochs.
    // routedLayout = the spec this batch was hashed with: the publish
    // carries the layout only if the table STILL has exactly it (a
    // concurrent re-bucket with a different count drops the carry
    // rather than corrupting co-partitioned plans)
    val v = Snapshots.publishAppend(s, loc, newFiles, marker,
      routedLayout = Some(format(spec)))
    if (v < 0) f.delete(dataDir, true)
    v
  }

  /** Fold each bucket's accumulated SMALL ingest files into one
    * key-sorted file per bucket, carrying every file at or above
    * `smallerThanBytes` — and every bucket with fewer than two
    * candidates — BY REFERENCE. This is what makes the ingest lifecycle
    * genuinely incremental under UNIFORM hash routing, where every
    * batch touches every bucket: a whole-bucket rewrite would re-read
    * the big base files and cost O(table) per fold, while this reads
    * only the per-epoch small files — O(accumulated ingest). Steady
    * state per bucket: one big base file + one consolidated ingest file
    * (SPJ groups them; per-bucket sortedness stays off until a full
    * [[commitBucketed]] restores single sorted files in a maintenance
    * window). Folded files read DV-APPLIED (their delete-vector entries
    * fold away, same rule as optimize_small); carried files keep the
    * version's vectors. A no-gain pass commits nothing and returns the
    * current version — safe on a timer. Row-preserving, so the
    * CHECK-constraint gate is skipped like every compaction. */
  def compactBuckets(s: SparkSession, loc: String,
                     smallerThanBytes: Long = 32L * 1024 * 1024): Long = {
    var attempt = 0
    while (attempt < 64) {
      val latest = Snapshots.latestVersion(s, loc)
      val spec = Snapshots.versionLayout(s, loc, latest).flatMap(parse)
        .getOrElse(throw new IllegalStateException(
          s"$loc has no active bucket layout to compact"))
      val files = Snapshots.versionFiles(s, loc, latest)
      val dvs = Snapshots.versionDvs(s, loc, latest)
      val schema = Snapshots.versionSchema(s, loc, latest)
      val lengths = Snapshots.fileSizes(s, files)
      val byBucket = files.groupBy(f => bucketOfPath(f).getOrElse(-1))
      val multi = byBucket.values.flatMap { fs =>
        val small = fs.filter(f =>
          lengths.get(Snapshots.normPath(f)).exists(_ < smallerThanBytes))
        if (small.length >= 2) small else Nil
      }.toSeq
      if (multi.isEmpty) return latest // nothing to bin-pack: no gain
      val kept = files.filterNot(multi.toSet)
      val dataDir = new Path(loc, s"data/${java.util.UUID.randomUUID()}")
      val f = dataDir.getFileSystem(s.sparkContext.hadoopConfiguration)
      val newFiles = writeBucketed(
        Snapshots.applyDv(s, Snapshots.readData(s, multi, schema), dvs),
        spec, dataDir)
      val keepDvs = if (kept.nonEmpty) dvs else Nil
      if (Snapshots.tryPublish(s, loc, latest + 1, kept ++ newFiles,
          dvs = keepDvs, schemaJson = schema.map(_.json),
          layout = Some(format(spec)), carriedValid = true))
        return latest + 1
      f.delete(dataDir, true) // lost the race: recompute against new latest
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race 64 times at $loc")
  }

  /** Rewrite the table hash-bucketed by `column` into `n` buckets and
    * publish it as a new version carrying the layout header. One shuffle
    * on the bucket id (each bucket lands wholly in one task, so exactly
    * one file per non-empty bucket), rows sorted by the key within each
    * bucket for tight row-group stats. Returns the published version. */
  def commitBucketed(s: SparkSession, loc: String, column: String,
                     n: Int): Long = {
    require(n >= 1, s"bucket count must be >= 1, got $n")
    require(!column.contains(",") && column.nonEmpty,
      s"bucket column must be a plain top-level column name: '$column'")
    val df = Snapshots.read(s, loc)
    require(df.columns.contains(column),
      s"bucket column '$column' not in table schema ${df.columns.mkString(",")}")
    val dataDir = new Path(loc, s"data/${java.util.UUID.randomUUID()}")
    val newFiles = writeBucketed(df, Spec(column, n), dataDir)
    Snapshots.publishLayout(s, loc, newFiles, df.schema.json, format(Spec(column, n)))
  }
}
