package graft.ops

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** Snapshot isolation invariants the registry query can't show alone:
  * every historical version stays bit-stable across later commits
  * (append AND logical overwrite), data files are immutable, and a
  * reader pinned before a commit is undisturbed by it. */
class SnapshotsSpec extends SparkTestBase {

  private def wipe(loc: String): Unit = {
    val p = new Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def dataFiles(loc: String): Map[String, Long] = {
    val p = new Path(s"$loc/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val it = fs.listFiles(p, true)
      val b = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.startsWith("part-"))
          b += (f.getPath.toString -> f.getModificationTime)
      }
      b.toMap
    }
  }

  test("append and replace publish versions; every version stays readable") {
    import spark.implicits._
    val loc = "/tmp/graft-test/snap_table"
    wipe(loc)
    val v1 = Snapshots.commitAppend(Seq(1L, 2L).toDF("id"), loc)
    val v2 = Snapshots.commitAppend(Seq(3L).toDF("id"), loc)
    val filesAfterV2 = dataFiles(loc)
    Thread.sleep(5)
    val v3 = Snapshots.commitReplace(Seq(9L).toDF("id"), loc)
    assert((v1, v2, v3) == (1L, 2L, 3L))
    def ids(v: Long) = Snapshots.read(spark, loc, v)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids(1) == Seq(1L, 2L))
    assert(ids(2) == Seq(1L, 2L, 3L))       // append accumulated
    assert(ids(3) == Seq(9L))                // logical overwrite
    assert(Snapshots.read(spark, loc).select("id").as[Long].collect()
      .sorted.toSeq == Seq(9L))              // latest == v3
    // v1/v2's data files untouched by the replace (immutability)
    val now = dataFiles(loc)
    filesAfterV2.foreach { case (f, m) =>
      assert(now.get(f).contains(m), s"historical file rewritten: $f") }
  }

  test("a reader pinned before a commit is undisturbed by it") {
    import spark.implicits._
    val loc = "/tmp/graft-test/snap_pin"
    wipe(loc)
    Snapshots.commitAppend(Seq(1L, 2L).toDF("id"), loc)
    val pinned = Snapshots.read(spark, loc) // resolves manifest v1 NOW
    Snapshots.commitReplace(Seq(42L).toDF("id"), loc)
    // the pinned plan still reads v1's explicit file list
    assert(pinned.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Snapshots.read(spark, loc).select("id").as[Long]
      .collect().toSeq == Seq(42L))
  }

  test("missing version fails fast; empty table fails fast") {
    import spark.implicits._
    val loc = "/tmp/graft-test/snap_missing"
    wipe(loc)
    intercept[IllegalArgumentException](Snapshots.read(spark, loc))
    Snapshots.commitAppend(Seq(1L).toDF("id"), loc)
    intercept[NoSuchElementException](Snapshots.read(spark, loc, version = 7))
  }
}
