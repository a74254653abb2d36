package graft.tools

import graft.ops.Snapshots

/** Manifest scale probe: grow the FILE COUNT per version (not the data —
  * the manifest layer's costs are O(live files) driver-side work and
  * never open a data file), and measure the three operations every
  * reader/committer pays: publishing a manifest naming n files, parsing
  * it back (`versionFiles`), and the incremental commit that carries n
  * prior lines plus a delta. Ghost paths are deliberate — the same
  * device ZoneMapTypedSpec uses — because nothing here stats or opens a
  * file, which is exactly the property being certified.
  *
  * The 100 TB arithmetic this probe grounds (see DESIGN.md "Manifest
  * scale bound"): 100 TB at the 128 MB compaction target is ~800k live
  * files; the probe runs past that (1M) and prints seconds + bytes per
  * row so the ceiling is measured, not guessed.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/tmp/graft-probe/manifest"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    Seq(10000, 100000, 1000000).foreach { n =>
      val loc = s"$base/n$n"
      val ghosts = (0 until n).map(i =>
        f"$loc/data/${i % 997}%03d-commit/part-$i%08d-probe.parquet")
      val (_, tPub) = time(Snapshots.publishAppend(spark, loc, ghosts))
      val ((files, tRead)) = time(Snapshots.versionFiles(spark, loc, 1L))
      require(files.length == n)
      // the incremental commit at n live files: reads the n-line manifest,
      // writes n+1 lines — the steady-state append cost
      val (_, tInc) = time(Snapshots.publishAppend(spark, loc,
        Seq(s"$loc/data/zzz-commit/part-extra-probe.parquet")))
      val fs = new org.apache.hadoop.fs.Path(loc)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = fs.getFileStatus(new org.apache.hadoop.fs.Path(
        f"$loc/_manifests/v00002.txt")).getLen
      // a marker scan across versions reads HEADERS only — file count
      // must not matter (the O(header) claim, measured)
      val (_, tMarkers) = time(Snapshots.markers(spark, loc))
      println(f"PROBE manifest n=$n%7d: publish=$tPub%6.2fs read=$tRead%6.2fs " +
        f"inc_commit=$tInc%6.2fs markers=$tMarkers%6.3fs " +
        f"bytes=$bytes (${bytes.toDouble / (n + 1)}%.1f B/file)")
    }
    spark.stop()
  }
}
