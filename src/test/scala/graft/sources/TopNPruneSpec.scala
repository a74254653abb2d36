package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Snapshots

/** Top-n / limit file pruning through the DSv2 catalog
  * ([[Snapshots.statTopFiles]] / [[Snapshots.statLimitFiles]] via
  * `ZoneMapScanBuilder`): `ORDER BY k LIMIT n` on a clustered,
  * sidecar-covered column plans only the files that can hold a top-n
  * row; a bare LIMIT keeps the shortest count-proven prefix. Pruning is
  * an optimization, never a correctness dependency — every case checks
  * rows against the unpruned answer. */
class TopNPruneSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/topn"

  private def wipe(): Unit = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.topncat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.topncat.root", root)
  }

  private def plannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => (b.scan match {
        case rp: graft.sources.v2.RuntimePrunedScan => rp.delegate
        case s => s
      }) match {
        case pq: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          pq.fileIndex.inputFiles.length
        case _ => 0
      }
    }.sum

  /** 8 single-file commits with disjoint ascending id ranges. */
  private def ranged(loc: String, nulls: Boolean = false): Unit = {
    import spark.implicits._
    (0 until 8).foreach { i =>
      val rows = (i * 100L until (i + 1) * 100L).map { v =>
        (v, if (nulls && v % 10 == 0) None else Some(v * 2))
      }
      Snapshots.commitAppend(rows.toDF("id", "v").coalesce(1), loc)
    }
    Snapshots.attachStats(spark, loc, 8L, Seq("id", "v"))
  }

  test("ORDER BY DESC LIMIT prunes to the top files, rows exact") {
    import spark.implicits._
    wipe(); register()
    ranged(s"$root/t")
    val df = spark.sql(
      "SELECT id FROM topncat.t ORDER BY id DESC LIMIT 150")
    assert(plannedFiles(df) == 2, df.queryExecution.executedPlan.toString)
    assert(df.as[Long].collect().toSeq == (650L to 799L).reverse)
    // ASC too (nulls-first default, no nulls present)
    val asc = spark.sql("SELECT id FROM topncat.t ORDER BY id LIMIT 150")
    assert(plannedFiles(asc) == 2)
    assert(asc.as[Long].collect().toSeq == (0L to 149L))
  }

  test("null-bearing files are kept for ASC (nulls first), counts stay sound") {
    import spark.implicits._
    wipe(); register()
    ranged(s"$root/n", nulls = true)
    // every file holds nulls of v -> ASC on v keeps all 8 files
    val asc = spark.sql("SELECT v FROM topncat.n ORDER BY v LIMIT 10")
    assert(plannedFiles(asc) == 8)
    assert(asc.collect().forall(_.isNullAt(0)), "nulls sort first")
    // DESC (nulls last): nulls can never crack the proven top-n — prune
    val desc = spark.sql(
      "SELECT v FROM topncat.n ORDER BY v DESC LIMIT 50")
    assert(plannedFiles(desc) == 1, desc.queryExecution.executedPlan.toString)
    val expected = (700L until 800L).filter(_ % 10 != 0).map(_ * 2)
      .sorted.reverse.take(50)
    assert(desc.as[Long].collect().toSeq == expected)
  }

  test("bare LIMIT keeps a count-proven prefix; filters disable pruning") {
    wipe(); register()
    ranged(s"$root/l")
    val lim = spark.sql("SELECT id FROM topncat.l LIMIT 150")
    assert(plannedFiles(lim) == 2)
    assert(lim.count() == 150L)
    // a pushed filter breaks the counting proof -> no top-n pruning on
    // top of it (the zone-map filter skip still narrows the scan)
    val filtered = spark.sql(
      "SELECT id FROM topncat.l WHERE id >= 300 ORDER BY id DESC LIMIT 10")
    assert(filtered.count() == 10L)
    assert(filtered.collect().map(_.getLong(0)).toSeq == (790L to 799L).reverse.take(10))
    // uncovered sort column -> no pruning, full list
    val unc = spark.sql(
      "SELECT id FROM topncat.l ORDER BY id + 0 DESC LIMIT 5")
    assert(unc.count() == 5L)
  }
}
