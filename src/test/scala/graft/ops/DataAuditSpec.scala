package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for the data-quality audit: exact counts per check shape, the
  * NULL-verdict-is-a-violation rule, the one-scan plan property for row
  * rules, and orphan/duplicate semantics. */
class DataAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("row rules count violations exactly; NULL verdicts are violations") {
    val df = Seq[(Integer, String)](
      (5, "ok"), (50, "ok"), (null, "ok"), (-3, null), (7, "bad"))
      .toDF("x", "s")
    val rows = DataAudit.rowRules(df, Seq("x_positive" -> (col("x") > 0)))
      .head().getLong(2)
    assert(rows === 5L)
    val m = DataAudit.rowRules(df, Seq(
        "x_positive" -> (col("x") > 0),       // -3 fails, null x -> NULL verdict
        "s_ok" -> (col("s") === "ok")))       // "bad" fails, null s -> NULL verdict
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("x_positive" -> 2L, "s_ok" -> 2L))
  }

  test("all row rules evaluate in one scan: a single aggregate over one relation") {
    val df = (1 to 100).map(i => (i, i * 2)).toDF("a", "b")
    val plan = DataAudit.rowRules(df, Seq(
        "r1" -> (col("a") > 0), "r2" -> (col("b") < 1000),
        "r3" -> (col("a") =!= col("b"))))
      .queryExecution.executedPlan.toString
    // one scan feeding one aggregate chain: no join, no union of scans
    assert(!plan.contains("Join") && !plan.contains("Union"),
      s"row rules did not stay single-scan:\n$plan")
  }

  test("uniqueCheck counts rows in excess of their key's first") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (3, "a"), (3, "b"))
      .toDF("k", "v")
    val out = DataAudit.uniqueCheck(df, "pk", Seq("k"))
      .as[(String, Long, Long)].head()
    assert(out === (("pk", 3L, 6L))) // (1: +2) + (3: +1)
    val clean = DataAudit.uniqueCheck(df.select("k").distinct(), "pk", Seq("k"))
      .as[(String, Long, Long)].head()
    assert(clean === (("pk", 0L, 3L)))
  }

  test("fkCheck counts orphans; NULL child keys are orphans") {
    val parent = Seq(1, 2, 3).toDF("pk")
    val child = Seq[Integer](1, 1, 2, 9, null).toDF("fk")
    val out = DataAudit.fkCheck(child, "fk", "fk_ok", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(out === (("fk_ok", 2L, 5L))) // 9 and null
  }

  test("audit on the fixture: clean tables report zero violations") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val o = graft.core.Tables.orders(spark, sf0001)
    val m = DataAudit.rowRules(li, Seq(
        "flag" -> col("l_returnflag").isInCollection(Seq("A", "N", "R")),
        "price" -> (col("l_extendedprice") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.values.forall(_ === 0L))
    val fk = DataAudit.fkCheck(li, "l_orderkey", "fk", o, "o_orderkey")
      .as[(String, Long, Long)].head()
    assert(fk._2 === 0L)
  }
}
