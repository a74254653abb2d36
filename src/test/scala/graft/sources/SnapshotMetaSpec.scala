package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Snapshots

/** Metadata tables and time-resolution through the DSv2 catalog:
  * `<cat>.<t>.history` (per-version file-set deltas), `<cat>.<t>.files`
  * (sizes + sidecar row counts), and `TIMESTAMP AS OF` resolving
  * manifest publish times — all manifest-sized driver work planned as
  * LocalTableScan, no data file opened. */
class SnapshotMetaSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/snapmeta"

  private def wipe(): Unit = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.metacat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.metacat.root", root)
  }

  test("history reports per-version file deltas and DV counts") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/h"
    Snapshots.commitAppend((1L to 60L).toDF("id").repartition(3), loc)
    Snapshots.commitAppend((61L to 80L).toDF("id").repartition(2), loc)
    Snapshots.commitDeleteMoR(spark, loc, col("id") === 5L) // DV, no rewrite
    Snapshots.commitReplace((1L to 10L).toDF("id").repartition(4), loc)
    val h = spark.sql(
      """SELECT version, n_files, n_dvs, added_files, removed_files
        |FROM metacat.h.history ORDER BY version""".stripMargin)
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
    assert(h == Seq((1L, 3, 0, 3, 0), (2L, 5, 0, 2, 0),
      (3L, 5, 1, 0, 0), (4L, 4, 0, 4, 5)))
    // plan shape: local, zero file scans
    val plan = spark.sql("SELECT * FROM metacat.h.history")
      .queryExecution.executedPlan
    assert(plan.collectFirst {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l }.isDefined)
    // a new commit is visible to the NEXT read without invalidation
    Snapshots.commitAppend(Seq(99L).toDF("id"), loc)
    assert(spark.sql("SELECT max(version) FROM metacat.h.history")
      .collect().head.getLong(0) == 5L)
  }

  test("files reports sizes always, row counts once a sidecar proves them") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/f"
    Snapshots.commitAppend((1L to 100L).toDF("id").repartition(4), loc)
    val bare = spark.sql(
      "SELECT path, size_bytes, row_count FROM metacat.f.files")
      .collect().toSeq
    assert(bare.length == 4)
    assert(bare.forall(r => r.getLong(1) > 0L && r.isNullAt(2)))
    Snapshots.attachStats(spark, loc, 1L, Seq("id"))
    val counted = spark.sql(
      "SELECT sum(row_count) AS n, count(*) AS f FROM metacat.f.files")
      .collect().head
    assert(counted.getLong(0) == 100L && counted.getLong(1) == 4L)
    // VERSION AS OF pins which version files describes
    Snapshots.commitReplace((1L to 10L).toDF("id").repartition(2), loc)
    assert(spark.sql(
      "SELECT count(*) FROM metacat.f.files").collect().head.getLong(0) == 2L)
    assert(spark.sql(
      "SELECT count(*) FROM metacat.f.files VERSION AS OF 1")
      .collect().head.getLong(0) == 4L)
  }

  test("TIMESTAMP AS OF resolves manifest publish times") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/tt"
    val before = System.currentTimeMillis() - 5
    Snapshots.commitAppend(Seq(1L, 2L).toDF("id"), loc)
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    Snapshots.commitAppend(Seq(3L).toDF("id"), loc)
    def idsAt(ms: Long): Seq[Long] = spark.sql(
      s"SELECT id FROM metacat.tt TIMESTAMP AS OF timestamp_millis(${ms}L)")
      .as[Long].collect().sorted.toSeq
    assert(idsAt(mid) == Seq(1L, 2L))
    assert(idsAt(System.currentTimeMillis() + 1000) == Seq(1L, 2L, 3L))
    val e = intercept[Exception](idsAt(before))
    assert(e.getMessage.contains("before the first commit"), e.getMessage)
  }

  test("stats reports sidecar coverage per column, blooms flagged") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/cov"
    Snapshots.commitAppend(
      (1L to 100L).map(i => (i, s"u$i")).toDF("id", "u").repartition(4), loc)
    // nothing attached yet: empty coverage
    assert(spark.sql("SELECT * FROM metacat.cov.stats").count() == 0L)
    Snapshots.attachStats(spark, loc, 1L, Seq("id"))
    graft.ops.BloomSidecar.attachBlooms(spark, loc, 1L, Seq("u"))
    val rows = spark.sql(
      """SELECT column, covered_files, total_files, proven_rows, has_bloom
        |FROM metacat.cov.stats ORDER BY column""".stripMargin).collect()
    assert(rows.length == 2)
    val id = rows(0); val u = rows(1)
    assert(id.getString(0) == "id" && id.getInt(1) == 4 && id.getInt(2) == 4 &&
      id.getLong(3) == 100L && !id.getBoolean(4))
    assert(u.getString(0) == "u" && u.getInt(1) == 0 && u.getBoolean(4))
  }

  test("buckets reports per-bucket skew, hottest first; empty off-layout") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/bk"
    // Zipf-ish: key 1 holds ~HALF the rows — its bucket must surface on top
    Snapshots.commitAppend(
      ((1L to 500L).map(_ => 1L) ++ (1L to 500L))
        .map(i => (i, s"v$i")).toDF("id", "v").repartition(4), loc)
    // no layout yet: zero rows, not an error
    assert(spark.sql("SELECT * FROM metacat.bk.buckets").count() == 0L)
    graft.ops.BucketLayout.commitBucketed(spark, loc, "id", 4)
    Snapshots.attachStats(spark, loc, 2L, Seq("id"))
    val rows = spark.sql(
      "SELECT bucket, key, n_files, bytes, rows FROM metacat.bk.buckets")
      .as[(Int, String, Int, Long, Long)].collect().toSeq
    assert(rows.map(_._5).sum == 1000L, s"proven rows must total the table: $rows")
    assert(rows.forall(r => r._3 == 1 && r._4 > 0L))
    assert(rows.map(_._2).forall(_.startsWith("id=")))
    // sorted hottest-first, and the hot key's bucket dominates
    assert(rows.map(_._4) == rows.map(_._4).sortBy(-_))
    val hot = java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(1L, org.apache.spark.sql.types.LongType, 42L).toInt, 4)
    assert(rows.head._1 == hot && rows.head._5 >= 500L,
      s"the Zipf-hot bucket must top the skew table: $rows (hot=$hot)")
    // plan shape: local metadata, no file scan
    val plan = spark.sql("SELECT * FROM metacat.bk.buckets")
      .queryExecution.executedPlan
    assert(plan.collectFirst {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l }.isDefined)
  }

  test("changes serves one commit's row delta; VERSION AS OF pins which") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/c"
    Snapshots.commitAppend((1L to 30L).toDF("id").repartition(2), loc)
    Snapshots.commitAppend((31L to 40L).toDF("id").repartition(2), loc)
    Snapshots.commitDelete(spark, loc, col("id") <= 5L)
    // no pin: the LATEST commit's delta (the delete)
    val latest = spark.sql("SELECT change, id FROM metacat.c.changes")
      .as[(String, Long)].collect().toSeq.sorted
    assert(latest == (1L to 5L).map(("delete", _)))
    // pinned: what commit 2 did, untouched by the later delete
    val c2 = spark.sql(
      "SELECT change, id FROM metacat.c.changes VERSION AS OF 2")
      .as[(String, Long)].collect().toSeq.sorted
    assert(c2 == (31L to 40L).map(("insert", _)))
    // commit 1's delta is "everything appeared" (diff from pre-history)
    assert(spark.sql(
      "SELECT count(*) FROM metacat.c.changes VERSION AS OF 1")
      .head().getLong(0) == 30L)
  }

  test("a REAL table shadowing a metadata name still resolves as data") {
    import spark.implicits._
    wipe(); register()
    // namespace ("ns") holds an actual table literally named "files"
    Snapshots.commitAppend(Seq(7L).toDF("id"), s"$root/ns/files")
    assert(spark.sql("SELECT id FROM metacat.ns.files")
      .as[Long].collect().toSeq == Seq(7L))
  }
}
