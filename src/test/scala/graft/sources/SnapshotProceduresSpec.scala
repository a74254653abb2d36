package graft.sources

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.SparkTestBase
import graft.ops.Snapshots

/** SQL `CALL` lifecycle procedures on the snapshot catalog
  * (`sources/v2/SnapshotProcedures.scala`): optimize compacts into a new
  * version, expire GCs history, attach_stats writes the zone-map sidecar
  * (enabling pruned reads), delete_mor commits a delete vector with zero
  * data-file rewrites — the whole maintenance story from pure SQL, each
  * returning a one-row result the caller can assert on. */
class SnapshotProceduresSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/sqlproc"

  private def fresh(name: String): String = {
    val loc = s"$root/$name"
    val p = new Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.conf.set("spark.sql.catalog.sqlproc",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.sqlproc.root", root)
    loc
  }

  test("CALL optimize compacts; CALL expire collects; results report the outcome") {
    import spark.implicits._
    val loc = fresh("t_opt")
    Snapshots.commitAppend((1L to 4000L).toDF("id").repartition(16), loc)
    Snapshots.commitAppend((4001L to 8000L).toDF("id").repartition(16), loc)
    val res = spark.sql("CALL sqlproc.system.optimize('t_opt')")
      .as[(Long, Int)].collect().head
    assert(res._1 == 3L && res._2 < 8, s"optimize result $res")
    assert(Snapshots.read(spark, loc).as[Long].collect().sorted.toSeq
      == (1L to 8000L))
    val gc = spark.sql("CALL sqlproc.system.expire('t_opt', 1)")
      .as[(Int, Int)].collect().head
    assert(gc._1 == 2 && gc._2 >= 32, s"expire result $gc")
    assert(Snapshots.read(spark, loc).count() == 8000L)
  }

  test("CALL attach_stats enables pruned reads; CALL delete_mor rewrites nothing") {
    import spark.implicits._
    val loc = fresh("t_stats")
    Snapshots.commitAppend(
      (1L to 8000L).toDF("id").repartitionByRange(8, col("id")), loc)
    val st = spark.sql("CALL sqlproc.system.attach_stats('t_stats', 'id')")
      .as[(Long, Int)].collect().head
    assert(st == ((1L, 1)))
    val pruned = Snapshots.readPruned(spark, loc, "id", "100", "200")
    assert(pruned.inputFiles.length < 8)
    assert(pruned.count() == 101L)
    // merge-on-read delete via CALL: data files untouched
    val before = Snapshots.versionFiles(spark, loc, 1L).toSet
    val v = spark.sql(
      "CALL sqlproc.system.delete_mor('t_stats', 'id BETWEEN 10 AND 20')")
      .as[Long].collect().head
    assert(v == 2L)
    assert(Snapshots.versionFiles(spark, loc, 2L).toSet == before,
      "delete_mor must not rewrite data files")
    assert(Snapshots.read(spark, loc).count() == 8000L - 11L)
  }

  test("unknown procedure and wrong namespace fail fast with the available list") {
    fresh("t_err")
    val e = intercept[Exception](
      spark.sql("CALL sqlproc.system.frobnicate('x')").collect())
    assert(e.getMessage.contains("optimize") || e.getMessage.contains("frobnicate"))
  }
}
