package graft.llm

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once-on-disk lifecycle for the retrieval family's persisted
  * artifacts: the IVF cell layout ([[Ivf.save]]), PQ codebooks + codes
  * ([[Pq.save]]), and the MinHash band index
  * ([[TextDedup.saveBandIndex]]).
  *
  * A saved index is trusted only when its completion marker exists.
  * Spark's per-directory `_SUCCESS` covers ONE write, but an index save
  * is SEVERAL writes (assigned + centroids; codes + codebooks) — a
  * crash between them must read back as "absent", never as a
  * half-index. [[ensure]] writes the marker last and deletes any
  * unmarked leftovers before rebuilding, and serializes concurrent
  * builders of the same path within the process (cross-process callers
  * coordinate the way any warehouse job does — one writer per table).
  *
  * [[fingerprint]] keys an index directory to the SOURCE data's file
  * listing (names, lengths, mtimes), so regenerated input silently gets
  * a fresh index path instead of stale cells — the moral equivalent of
  * a snapshot id in a table format.
  */
object IndexStore {

  private val locks = new ConcurrentHashMap[String, Object]()

  /** Run `build` unless `path` already holds a COMPLETE index; mark
    * completion only after `build` returns. Returns true if it built. */
  def ensure(spark: SparkSession, path: String)(build: => Unit): Boolean = {
    val lock = locks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(root, "_GRAFT_INDEX_COMPLETE")
      if (fs.exists(marker)) false
      else {
        if (fs.exists(root)) fs.delete(root, true) // half-written attempt
        build
        fs.create(marker, true).close()
        true
      }
    }
  }

  /** Content fingerprint of a data directory (or single file): a hash of
    * its recursive (name, length, mtime) listing. Driver-side metadata
    * ops only — no data read. */
  def fingerprint(spark: SparkSession, dataPath: String): String = {
    val root = new Path(dataPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path): Unit = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory) fs.listStatus(p).sortBy(_.getPath.getName).foreach(s => walk(s.getPath))
      else entries += s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
    }
    walk(root)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(entries.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** A session-stable index directory for `kind` over the data at
    * `dataPath` (fingerprinted, so regenerated data rebuilds). Lives
    * under java.io.tmpdir — at 100 TB this would be a warehouse path;
    * the lifecycle (marker, fingerprint, build-once) is the same. */
  def indexDir(spark: SparkSession, kind: String, dataPath: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_indexes/${kind}_${fingerprint(spark, dataPath)}"
}
