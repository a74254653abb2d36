package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Versioned table snapshots over immutable data files — a minimal
  * manifest-based table format (the mechanism behind Iceberg/Delta-style
  * snapshot isolation, built from the same two primitives the reference's
  * FileOutputCommitter trusts: immutable files + atomic rename).
  *
  * Layout: `<loc>/data/<commit-uuid>/part-*.parquet` (never rewritten),
  * `<loc>/_manifests/v<NNNNN>.txt` (one live data-file path per line).
  * A commit writes its files under a fresh data subdirectory, then
  * publishes the next manifest listing ALL live files with a single
  * rename. Readers pin one manifest, so:
  *  - a reader never sees a half-committed batch (the manifest appears
  *    atomically, after the files it names);
  *  - a commit never disturbs a running read (no file it reads changes);
  *  - any historical version stays readable until explicitly expired —
  *    time travel over the whole TABLE, complementing the row-level
  *    SCD2 `snapshotAsOf` in [[Merge]].
  *
  * Scale notes (100 TB): commits append ONLY their delta's files; the
  * manifest is O(live files), not O(rows), and is written by the driver
  * (a 100k-file table is a ~10 MB manifest). Version reads hand Spark an
  * explicit file list — no directory listing of the whole table, which
  * on object stores is the slow path. Expiry = delete manifests older
  * than the retention horizon plus any data file no surviving manifest
  * names.
  */
object Snapshots {

  private def fs(s: SparkSession, loc: String) =
    new Path(loc).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestDir(loc: String) = new Path(loc, "_manifests")

  private def manifests(s: SparkSession, loc: String): Seq[(Long, Path)] = {
    val md = manifestDir(loc)
    val f = fs(s, loc)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .filter(_.getPath.getName.matches("v\\d+\\.txt"))
      .map(st => (st.getPath.getName.stripPrefix("v").stripSuffix(".txt").toLong,
        st.getPath))
      .sortBy(_._1)
  }

  /** Latest committed version, or 0 if the table is empty. */
  def latestVersion(s: SparkSession, loc: String): Long =
    manifests(s, loc).lastOption.map(_._1).getOrElse(0L)

  private def readManifest(s: SparkSession, p: Path): Seq[String] = {
    val in = fs(s, p.toString).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Append `df` as a new snapshot; returns the published version. */
  def commitAppend(df: DataFrame, loc: String): Long = {
    val s = df.sparkSession
    val f = fs(s, loc)
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = new Path(loc, s"data/$commitId")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val newFiles = f.listStatus(dataDir).toSeq
      .map(_.getPath).filter(p => p.getName.startsWith("part-"))
      .map(_.toString)
    val prev = manifests(s, loc).lastOption
    val prevFiles = prev.map { case (_, p) => readManifest(s, p) }.getOrElse(Nil)
    val version = prev.map(_._1).getOrElse(0L) + 1
    publish(s, loc, version, prevFiles ++ newFiles)
    version
  }

  /** Replace the table's content with `df` as a new snapshot (logical
    * overwrite; old versions stay readable — no file is deleted). */
  def commitReplace(df: DataFrame, loc: String): Long = {
    val s = df.sparkSession
    val f = fs(s, loc)
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = new Path(loc, s"data/$commitId")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val newFiles = f.listStatus(dataDir).toSeq
      .map(_.getPath).filter(_.getName.startsWith("part-")).map(_.toString)
    val version = latestVersion(s, loc) + 1
    publish(s, loc, version, newFiles)
    version
  }

  private def publish(s: SparkSession, loc: String, version: Long,
                      files: Seq[String]): Unit = {
    val f = fs(s, loc)
    val md = manifestDir(loc)
    f.mkdirs(md)
    val tmp = new Path(md, f"_tmp_v$version%05d.txt")
    val out = f.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new Path(md, f"v$version%05d.txt")
    if (!f.rename(tmp, target))
      throw new IllegalStateException(
        s"concurrent commit: version $version already published at $loc")
  }

  /** Read a pinned version (default: latest). An empty table (version 0)
    * is an error — there is nothing to infer a schema from. */
  def read(s: SparkSession, loc: String, version: Long = -1L): DataFrame = {
    val ms = manifests(s, loc)
    require(ms.nonEmpty, s"no committed snapshots at $loc")
    val (v, p) =
      if (version < 0) ms.last
      else ms.find(_._1 == version).getOrElse(
        throw new NoSuchElementException(s"version $version not found at $loc"))
    val files = readManifest(s, p)
    if (files.isEmpty) s.emptyDataFrame else s.read.parquet(files: _*)
  }
}
