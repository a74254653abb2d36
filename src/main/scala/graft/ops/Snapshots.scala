package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, Options, Path}

/** Versioned table snapshots over immutable data files — a minimal
  * manifest-based table format (the mechanism behind Iceberg/Delta-style
  * snapshot isolation, built from the same two primitives the reference's
  * FileOutputCommitter trusts: immutable files + atomic rename).
  *
  * Layout: `<loc>/data/<commit-uuid>/part-*.parquet` (never rewritten),
  * `<loc>/_manifests/v<NNNNN>.txt` (one live data-file path per line).
  * A commit writes its files under a fresh data subdirectory, then
  * publishes the next manifest listing ALL live files with a single
  * no-overwrite rename. Readers pin one manifest, so:
  *  - a reader never sees a half-committed batch (the manifest appears
  *    atomically, after the files it names);
  *  - a commit never disturbs a running read (no file it reads changes);
  *  - any historical version stays readable until explicitly expired —
  *    time travel over the whole TABLE, complementing the row-level
  *    SCD2 `snapshotAsOf` in [[Merge]].
  *
  * Concurrency: commits are optimistic CAS loops. A committer reads the
  * latest manifest, writes the next version to a unique temp file, and
  * claims the version name with `FileContext.rename(…, Rename.NONE)` —
  * rename-without-overwrite, which FAILS if the target exists (atomic on
  * HDFS; on the local FS the existence check is client-side, a window
  * narrow enough for tests). A loser re-reads the new latest — picking up
  * the winner's files — and retries at the next version, so concurrent
  * appends serialize with no version lost. Deployment precondition (the
  * usual table-format rule): the manifest directory must live on a
  * filesystem with atomic no-overwrite rename (HDFS, or an object store
  * fronted by a consistent metastore); raw S3 renames are copy+delete and
  * cannot fence two writers.
  *
  * Scale notes (100 TB): commits append ONLY their delta's files; the
  * manifest is O(live files), not O(rows), and is written by the driver
  * (a 100k-file table is a ~10 MB manifest). Version reads hand Spark an
  * explicit file list — no directory listing of the whole table, which
  * on object stores is the slow path. Expiry = delete manifests older
  * than the retention horizon plus any data file no surviving manifest
  * names (with a modification-time grace window protecting in-flight
  * commits, the Delta/Iceberg vacuum rule).
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

  // manifest lines: '#'-prefixed header lines carry commit metadata
  // (e.g. the exactly-once batch marker); every other line is a live
  // data-file path
  private def manifestLines(s: SparkSession, p: Path): Seq[String] = {
    val in = fs(s, p.toString).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  // header block only: markers ride as the leading '#' lines, so the
  // per-version cost of a marker scan is O(header), not O(live files) —
  // an append manifest lists the whole table, and reading it in full per
  // micro-batch would make the replay check O(versions x files)
  private def headerLines(s: SparkSession, p: Path): Seq[String] = {
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs(s, p.toString).open(p), "UTF-8"))
    try {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      var line = rd.readLine()
      while (line != null && line.startsWith("#")) { buf += line; line = rd.readLine() }
      buf.toList
    } finally rd.close()
  }

  private def readManifest(s: SparkSession, p: Path): Seq[String] =
    manifestLines(s, p).filterNot(l => l.startsWith("#") || l.isEmpty)

  /** Append `df` as a new snapshot; returns the published version.
    *
    * `marker`, if given, makes the commit IDEMPOTENT: it is recorded in
    * the published manifest (a `#` header line), so data and marker
    * become visible in the same atomic rename, and the marker set is
    * re-checked INSIDE the CAS loop immediately before each publish
    * attempt — two live attempts of the same logical commit (a zombie
    * driver racing its restarted successor) cannot both land. The loser
    * either loses the version rename (and sees the marker on re-read) or
    * sees the marker up front; both paths remove its orphaned data
    * directory and return -1. */
  def commitAppend(df: DataFrame, loc: String,
                   marker: Option[String] = None): Long = {
    val s = df.sparkSession
    val f = fs(s, loc)
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = new Path(loc, s"data/$commitId")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val newFiles = f.listStatus(dataDir).toSeq
      .map(_.getPath).filter(p => p.getName.startsWith("part-"))
      .map(_.toString)
    var attempt = 0
    while (attempt < 64) {
      if (marker.exists(m => markers(s, loc).contains(m))) {
        f.delete(dataDir, true) // duplicate: our files are unreferenced garbage
        return -1L
      }
      val prev = manifests(s, loc).lastOption
      val prevFiles = prev.map { case (_, p) => readManifest(s, p) }.getOrElse(Nil)
      val version = prev.map(_._1).getOrElse(0L) + 1
      if (tryPublish(s, loc, version, prevFiles ++ newFiles, marker)) return version
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race 64 times at $loc")
  }

  /** Every commit marker recorded by surviving manifests (markers on
    * expired versions are forgotten with them — size retention to the
    * retention horizon, same as any table format's transaction log).
    * Cost: one header read per version — markers are `#` HEADER lines,
    * so no manifest body (the O(live files) part) is ever read. */
  def markers(s: SparkSession, loc: String): Set[String] =
    manifests(s, loc).flatMap { case (_, p) =>
      headerLines(s, p).filter(_.startsWith("#marker="))
        .map(_.stripPrefix("#marker="))
    }.toSet

  /** Replace the table's content with `df` as a new snapshot (logical
    * overwrite; old versions stay readable — no file is deleted). Same
    * CAS loop as [[commitAppend]]: racing a concurrent append, the
    * replace either publishes first (the append lands after it, on top)
    * or retries at the next version — either serialization is a valid
    * history and no version is lost. */
  def commitReplace(df: DataFrame, loc: String): Long = {
    val s = df.sparkSession
    val f = fs(s, loc)
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = new Path(loc, s"data/$commitId")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val newFiles = f.listStatus(dataDir).toSeq
      .map(_.getPath).filter(_.getName.startsWith("part-")).map(_.toString)
    var attempt = 0
    while (attempt < 64) {
      val version = latestVersion(s, loc) + 1
      if (tryPublish(s, loc, version, newFiles)) return version
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race 64 times at $loc")
  }

  /** One publish attempt: write a UNIQUE temp file (two racers must not
    * share one), then claim `v<NNNNN>.txt` with rename-without-overwrite.
    * Returns false (and removes its temp) if another committer claimed
    * the version first. Plain `FileSystem.rename` is useless as a fence
    * here — on the local FS it silently overwrites an existing target —
    * which is exactly what `FileContext` + `Options.Rename.NONE` exists
    * to fix. */
  private def tryPublish(s: SparkSession, loc: String, version: Long,
                         files: Seq[String],
                         marker: Option[String] = None): Boolean = {
    marker.foreach(m => require(!m.contains("\n") && !m.contains("\r"),
      "marker must be a single line"))
    val f = fs(s, loc)
    val md = manifestDir(loc)
    f.mkdirs(md)
    val tmp = new Path(md,
      f"_tmp_${java.util.UUID.randomUUID().toString}%s_v$version%05d.txt")
    val out = f.create(tmp, true)
    val header = marker.map(m => s"#marker=$m\n").getOrElse("")
    try out.write((header + files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new Path(md, f"v$version%05d.txt")
    val fc = FileContext.getFileContext(target.toUri,
      s.sparkContext.hadoopConfiguration)
    try { fc.rename(tmp, target, Options.Rename.NONE); true }
    catch {
      case _: FileAlreadyExistsException | _: org.apache.hadoop.fs.PathExistsException =>
        f.delete(tmp, false); false
    }
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

  /** The live file list of a pinned version — the unit a DSv2 scan plans
    * from (see [[graft.sources.v2.SnapshotCatalog]]). */
  private[graft] def versionFiles(s: SparkSession, loc: String, version: Long): Seq[String] = {
    val ms = manifests(s, loc)
    ms.find(_._1 == version)
      .map { case (_, p) => readManifest(s, p) }
      .getOrElse(throw new NoSuchElementException(
        s"version $version not found at $loc"))
  }

  /** Exact multiset row-level delta `from → to`: one row per inserted /
    * deleted occurrence, tagged in a leading `change` column.
    *
    * The manifest layer makes this cost O(changed data), not O(table):
    * data files are immutable, so any file BOTH manifests name
    * contributes nothing and is never opened — only the symmetric
    * file-set difference is read. After an append that is exactly the
    * delta's files; after a logical overwrite every file differs, but the
    * per-side `exceptAll` still nets out rows that merely moved files, so
    * the row-level answer is identical either way. At 100 TB a
    * diff-after-append reads megabytes, not the table (SnapshotsSpec pins
    * `inputFiles ⊆ changed files`). */
  def diff(s: SparkSession, loc: String, fromVersion: Long,
           toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val fromF = versionFiles(s, loc, fromVersion)
    val toF = versionFiles(s, loc, toVersion)
    val removedF = fromF.filterNot(toF.toSet)
    val addedF = toF.filterNot(fromF.toSet)
    def readFiles(fs: Seq[String]): Option[DataFrame] =
      if (fs.isEmpty) None else Some(s.read.parquet(fs: _*))
    (readFiles(addedF), readFiles(removedF)) match {
      case (None, None) =>
        // identical manifests — shape the empty result from the pinned
        // version so downstream schema handling is uniform
        val base = read(s, loc, toVersion)
        base.filter(lit(false)).select(
          lit("insert").as("change") +: base.columns.map(col).toIndexedSeq: _*)
      case (a, r) =>
        val schemaSrc = a.orElse(r).get
        val empty = schemaSrc.filter(lit(false))
        val added = a.getOrElse(empty)
        val removed = r.getOrElse(empty)
        def tag(df: DataFrame, t: String) =
          df.select(lit(t).as("change") +: df.columns.map(col): _*)
        tag(added.exceptAll(removed), "insert")
          .unionByName(tag(removed.exceptAll(added), "delete"))
    }
  }

  /** Compaction as a COMMIT — the snapshot-native OPTIMIZE, closing the
    * loop between [[Compaction]] (directory-swap, readers race the
    * rename on object stores) and the manifest layer (no rename race is
    * possible: a new version's files land first, the manifest publishes
    * atomically, pinned readers keep their file lists). Rewrites the
    * LATEST version's content into ~`targetBytes` files via the AQE
    * rebalance hint and publishes it as a new version with identical
    * rows; the superseded small files stay until [[expire]] collects
    * them. Returns the published version.
    *
    * The advisory-size override is scoped to a CLONED session (same
    * SparkContext, copied runtime conf), so concurrent queries on the
    * caller's session never observe the altered value and two concurrent
    * compactions cannot race a set/restore on shared conf. */
  def commitCompaction(s: SparkSession, loc: String,
                       targetBytes: Long = 128L * 1024 * 1024): Long = {
    val scoped = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      try scoped.conf.set(k, v) catch { case _: Exception => () } // static confs
    }
    scoped.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      targetBytes.toString)
    commitReplace(read(scoped, loc).hint("rebalance"), loc)
  }

  /** Retention GC: keep the newest `retainLast` versions, drop every
    * older manifest, then delete dead data files. Returns (manifests
    * dropped, data files deleted). A data file is dead if either
    *  - an EXPIRED manifest named it and no surviving one does (its
    *    version is gone, so it is unreachable forever), or
    *  - NO manifest names it and it is older than `orphanGraceMs`
    *    (failed-commit garbage). The grace window is what protects an
    *    IN-FLIGHT commit — files written but whose manifest has not
    *    published yet are also named by no manifest, and deleting them
    *    would let the commit publish a manifest of deleted files. Same
    *    rule as Delta/Iceberg vacuum retention. Size the window above
    *    the longest possible write+publish gap (a micro-batch, a big
    *    backfill's write time).
    *
    * Order matters for crash safety: manifests are removed FIRST, so a
    * crash mid-expire leaves orphaned data files (harmless garbage the
    * next expire collects) — never a live manifest naming deleted files.
    * At 100 TB both sides are driver-side metadata work (manifest lines
    * vs a data-directory listing); the deletes themselves are O(dead
    * files). */
  def expire(s: SparkSession, loc: String, retainLast: Int,
             orphanGraceMs: Long = 10L * 60 * 1000): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the latest version")
    val f = fs(s, loc)
    val ms = manifests(s, loc)
    val dropped = ms.dropRight(retainLast)
    val kept = ms.takeRight(retainLast)
    val live = kept.flatMap { case (_, p) => readManifest(s, p) }.toSet
    val expiredRefs = dropped.flatMap { case (_, p) => readManifest(s, p) }.toSet -- live
    dropped.foreach { case (_, p) => f.delete(p, false) }
    val dataRoot = new Path(loc, "data")
    val orphanHorizon = System.currentTimeMillis() - orphanGraceMs
    var deleted = 0
    if (f.exists(dataRoot)) {
      val it = f.listFiles(dataRoot, true)
      val dead = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        val pStr = st.getPath.toString
        if (name.startsWith("part-") && !live.contains(pStr) &&
            (expiredRefs.contains(pStr) ||
             st.getModificationTime < orphanHorizon))
          dead += st.getPath
      }
      dead.foreach { p => if (f.delete(p, false)) deleted += 1 }
      // drop commit directories the sweep emptied of data files
      // (_SUCCESS markers go with their directory) — but never a young
      // directory that might belong to an in-flight commit
      f.listStatus(dataRoot).foreach { d =>
        def hasData = {
          val c = f.listFiles(d.getPath, true)
          var found = false
          while (!found && c.hasNext)
            found = c.next().getPath.getName.startsWith("part-")
          found
        }
        if (d.isDirectory && d.getModificationTime < orphanHorizon && !hasData)
          f.delete(d.getPath, true)
      }
    }
    (dropped.size, deleted)
  }
}
