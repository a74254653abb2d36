package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Snapshots
import graft.sources.v2.RuntimePrunedScan

/** Runtime (join-driven) file skipping: when a snapshot table is
  * broadcast-joined on a sidecar-covered column, Spark's dynamic-pruning
  * rule hands the dim side's key values to the scan at EXECUTION time
  * (`SupportsRuntimeV2Filtering`), and the scan re-prunes its file list
  * through the same zone-map + Bloom fold static predicates use — fact
  * files the query text never named are skipped. Rows always equal the
  * unpruned join. */
class RuntimePruneSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/runtimeprune"

  private def wipe(): Unit = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.rpcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.rpcat.root", root)
  }

  test("broadcast-join keys prune fact files through the sidecar at runtime") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/fact"
    // 8 range-clustered files over id 0..7999
    Snapshots.commitAppend(
      (0L until 8000L).map(i => (i, i % 97)).toDF("id", "v")
        .repartitionByRange(8, col("id")), loc)
    Snapshots.attachStats(spark, loc, 1L, Seq("id"))
    // tiny dim with a selective filter: keys land in ONE fact file
    (0L until 8000L by 400L).map(i => (i, if (i < 1000) "hot" else "cold"))
      .toDF("k", "tag").write.mode("overwrite").parquet(s"$root/dim_pq")
    val dim = spark.read.parquet(s"$root/dim_pq")
    dim.createOrReplaceTempView("dim")
    val df = spark.sql(
      """SELECT f.id, f.v FROM rpcat.fact f
        |JOIN dim d ON f.id = d.k
        |WHERE d.tag = 'hot'""".stripMargin)
    val rows = df.collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(0L, 400L, 800L), rows.toString)
    val kept = RuntimePrunedScan.lastKeptFiles(loc)
    assert(kept.isDefined, "runtime filter never reached the scan")
    assert(kept.get < 8, s"runtime pruning kept ${kept.get} of 8 files")
  }

  test("an unfilterable dim prunes nothing but stays correct") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/fact2"
    Snapshots.commitAppend(
      (0L until 2000L).toDF("id").repartitionByRange(4, col("id")), loc)
    Snapshots.attachStats(spark, loc, 1L, Seq("id"))
    val dim = (0L until 2000L by 10L).toDF("k")
    dim.createOrReplaceTempView("dim2")
    // no selective dim filter -> Spark may not inject a runtime filter at
    // all; either way the join result is exact
    val n = spark.sql(
      "SELECT f.id FROM rpcat.fact2 f JOIN dim2 d ON f.id = d.k").count()
    assert(n == 200L)
  }
}
