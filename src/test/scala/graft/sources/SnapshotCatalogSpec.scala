package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Snapshots

/** SQL time travel through the DSv2 SnapshotCatalog: `VERSION AS OF`
  * resolves pinned manifests, latest reads track new commits, pruning
  * reaches the parquet scan, and DDL is rejected (read-only catalog). */
class SnapshotCatalogSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/snapcat"

  private def wipe(): Unit = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.snapcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snapcat.root", root)
  }

  test("VERSION AS OF resolves pinned manifests; bare reads track latest") {
    import spark.implicits._
    wipe(); register()
    Snapshots.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), s"$root/t")
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "v"), s"$root/t")
    Snapshots.commitReplace(Seq((9L, "z")).toDF("id", "v"), s"$root/t")
    def ids(sql: String) =
      spark.sql(sql).select("id").as[Long].collect().sorted.toSeq
    assert(ids("SELECT id FROM snapcat.t VERSION AS OF 1") == Seq(1L, 2L))
    assert(ids("SELECT id FROM snapcat.t VERSION AS OF 2") == Seq(1L, 2L, 3L))
    assert(ids("SELECT id FROM snapcat.t") == Seq(9L))
    // a new commit is visible to the NEXT bare read without invalidation
    Snapshots.commitAppend(Seq((10L, "y")).toDF("id", "v"), s"$root/t")
    assert(ids("SELECT id FROM snapcat.t") == Seq(9L, 10L))
  }

  test("predicate pushdown and column pruning reach the pinned parquet scan") {
    import spark.implicits._
    wipe(); register()
    Snapshots.commitAppend((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"),
      s"$root/pruned")
    val plan = spark.sql("SELECT id FROM snapcat.pruned WHERE id = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
  }

  test("missing table / version / unsupported DDL all fail fast") {
    import spark.implicits._
    wipe(); register()
    Snapshots.commitAppend(Seq(1L).toDF("id"), s"$root/t")
    intercept[Exception](spark.sql("SELECT * FROM snapcat.nope").collect())
    intercept[Exception](
      spark.sql("SELECT * FROM snapcat.t VERSION AS OF 99").collect())
    // destructive/unsupported evolution rejected (rename breaks pinned
    // readers; DROP TABLE itself is supported — SnapshotDdlSpec)
    intercept[Exception](
      spark.sql("ALTER TABLE snapcat.t RENAME COLUMN id TO id2"))
    assert(Snapshots.latestVersion(spark, s"$root/t") == 1L) // untouched
  }

  test("listTables finds exactly the directories with published manifests") {
    import spark.implicits._
    wipe(); register()
    Snapshots.commitAppend(Seq(1L).toDF("id"), s"$root/t1")
    Snapshots.commitAppend(Seq(2L).toDF("id"), s"$root/t2")
    // a directory without manifests is not a table
    val junk = new Path(s"$root/notatable/data")
    junk.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(junk)
    val names = spark.sql("SHOW TABLES IN snapcat").select("tableName")
      .as[String].collect().sorted.toSeq
    assert(names == Seq("t1", "t2"))
  }
}
