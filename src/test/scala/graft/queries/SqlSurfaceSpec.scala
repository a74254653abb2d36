package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** The SQL entry point: everything the DataFrame registry exposes is
  * equally reachable through `spark.sql(...)` — temp views over the
  * tables, the engine's custom expressions callable from SQL, and the
  * analytic SQL surface (windows, grouping sets) producing the same
  * results as the DataFrame formulations. */
class SqlSurfaceSpec extends SparkTestBase {

  private def views(): Unit = {
    Tables.documents(spark, sf0001).createOrReplaceTempView("documents")
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("lineitem")
    graft.functions.GraftFunctions.register(spark)
  }

  test("SQL aggregation equals the DataFrame formulation") {
    views()
    val sql = spark.sql(
      """SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val df = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sql == df && sql.nonEmpty)
  }

  test("custom expressions are callable from SQL") {
    views()
    val r = spark.sql(
      """SELECT doc_id, graft_mingram(text, 8) AS fp,
        |  graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot
        |FROM documents LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(_.getString(1).length == 32))
    assert(r.forall(_.getDouble(2) == 11.0))
  }

  test("SQL windows and grouping sets match DataFrame results") {
    views()
    val sql = spark.sql(
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val df = Tables.documents(spark, sf0001)
      .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sql == df && sql.nonEmpty)
  }

  test("GraftExtensions wires both engine expressions without error") {
    // a second SparkContext (to exercise spark.sql.extensions end-to-end)
    // can't exist in the shared test JVM; the injection callback itself is
    // exercised here, and the expressions' SQL behavior is covered above
    // through the equivalent registry path
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }
}
