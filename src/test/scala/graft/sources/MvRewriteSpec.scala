package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Mv, Snapshots}

/** Transparent MV routing ([[graft.sources.v2.MvRewrite]]): an
  * aggregate a FRESH materialized view stores is served from the MV —
  * provably (the optimized plan scans the MV's files), exactly (results
  * equal the base recompute) — and every disqualifier (staleness,
  * WHERE, expression keys, uncovered aggregates, time travel, the off
  * valve) leaves the plan reading the base. */
class MvRewriteSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/mvrw"

  private def fresh(name: String): String = {
    val loc = s"$root/$name"
    val p = new Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.conf.set("spark.sql.catalog.mvrw",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.mvrw.root", root)
    loc
  }

  /** Does the optimized plan read the MV's data directory? */
  private def readsMv(df: DataFrame, mvLoc: String): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("mv:") ||
      df.inputFiles.exists(f => f.startsWith(s"file:$mvLoc/data/") ||
        f.startsWith(s"$mvLoc/data/"))

  test("a fresh MV serves count(*)/count(c)/sum(c); staleness and the valve fall back") {
    val base = fresh("b1"); val mv = fresh("m1")
    import spark.implicits._
    Snapshots.commitAppend(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "k", "v"), base)
    spark.sql("CALL mvrw.system.create_mv('m1', 'b1', 'k', 'v')")
    val q = () => spark.sql(
      """SELECT k, count(*) AS cnt, sum(v) AS total, count(v) AS vn
        |FROM mvrw.b1 GROUP BY k ORDER BY k""".stripMargin)
    val routed = q()
    assert(readsMv(routed, mv), s"fresh MV must serve:\n" +
      routed.queryExecution.optimizedPlan)
    assert(routed.as[(String, Long, Long, Long)].collect().toSeq
      == Seq(("a", 2L, 30L, 2L), ("b", 1L, 5L, 1L)))
    // base advances -> MV stale -> the BASE answers (fresh rows visible)
    Snapshots.commitAppend(Seq((4L, "b", 7L)).toDF("id", "k", "v"), base)
    val stale = q()
    assert(!readsMv(stale, mv), "a stale MV must never serve")
    assert(stale.as[(String, Long, Long, Long)].collect().toSeq
      == Seq(("a", 2L, 30L, 2L), ("b", 2L, 12L, 2L)))
    // refresh -> routed again
    spark.sql("CALL mvrw.system.refresh_mv('m1')")
    assert(readsMv(q(), mv))
    assert(q().as[(String, Long, Long, Long)].collect().toSeq
      == Seq(("a", 2L, 30L, 2L), ("b", 2L, 12L, 2L)))
    // the valve turns it off
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(!readsMv(q(), mv), "valve off must read the base")
    finally spark.conf.unset("spark.graft.mv.rewrite")
  }

  test("disqualifiers: WHERE, expression keys, uncovered aggregates, time travel") {
    val base = fresh("b2"); val mv = fresh("m2")
    import spark.implicits._
    // `id` NULLABLE: Catalyst folds count(non-null col) to count(*) —
    // which the MV legitimately serves — so the "uncovered count"
    // disqualifier needs a column whose count is NOT the row count
    Snapshots.commitAppend(Seq((Some(1L), "a", 10L), (None, "b", 20L))
      .toDF("id", "k", "v"), base)
    spark.sql("CALL mvrw.system.create_mv('m2', 'b2', 'k', 'v')")
    assert(readsMv(spark.sql(
      "SELECT k, count(*) AS n2 FROM mvrw.b2 GROUP BY k"), mv))
    Seq(
      "SELECT k, count(*) AS n2 FROM mvrw.b2 WHERE v > 5 GROUP BY k",
      "SELECT upper(k) AS k2, count(*) AS n2 FROM mvrw.b2 GROUP BY upper(k)",
      "SELECT k, max(v) AS mx FROM mvrw.b2 GROUP BY k",
      "SELECT k, count(DISTINCT v) AS dv FROM mvrw.b2 GROUP BY k",
      "SELECT k, count(id) AS ci FROM mvrw.b2 GROUP BY k",
      "SELECT k, sum(id) AS si FROM mvrw.b2 GROUP BY k",
      "SELECT k, count(*) AS n2 FROM mvrw.b2 VERSION AS OF 1 GROUP BY k"
    ).foreach { sql =>
      val df = spark.sql(sql)
      assert(!readsMv(df, mv), s"must not rewrite: $sql")
      df.collect() // and it still runs
    }
    // HAVING keeps the rewrite (the filter sits ABOVE the aggregate)
    val having = spark.sql(
      """SELECT k, count(*) AS n2 FROM mvrw.b2
        |GROUP BY k HAVING count(*) > 0 ORDER BY k""".stripMargin)
    assert(readsMv(having, mv))
    assert(having.as[(String, Long)].collect().toSeq
      == Seq(("a", 1L), ("b", 1L)))
  }

  test("a bucketed MV serves too, and a dropped MV's dangling pointer is harmless") {
    val base = fresh("b3"); val mv = fresh("m3")
    import spark.implicits._
    Snapshots.commitAppend((1L to 100L).map(i => (i, s"k${i % 10}", i))
      .toDF("id", "k", "v"), base)
    spark.sql("CALL mvrw.system.create_mv('m3', 'b3', 'k', 'v', 4)")
    val q = spark.sql(
      "SELECT k, sum(v) AS sv FROM mvrw.b3 GROUP BY k ORDER BY k")
    assert(readsMv(q, mv))
    val expect = (1L to 100L).groupBy(i => s"k${i % 10}")
      .map { case (k, is) => (k, is.sum) }.toSeq.sortBy(_._1)
    assert(q.as[(String, Long)].collect().toSeq == expect)
    // drop the MV out from under its pointer: the rule skips it
    assert(Mv.usersOf(spark, base) == Seq(mv))
    val p = new Path(mv)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val after = spark.sql(
      "SELECT k, sum(v) AS sv FROM mvrw.b3 GROUP BY k ORDER BY k")
    assert(!readsMv(after, mv))
    assert(after.as[(String, Long)].collect().toSeq == expect)
  }
}
