package graft.ops

import graft.SparkTestBase
import graft.ops.CompositeJoin._
import org.apache.spark.sql.functions._

class CompositeJoinSpec extends SparkTestBase {

  test("expression parser handles nesting (reference lib/join/Parser.java)") {
    assert(parse("inner(a,b)") == Node("inner", Seq(Tbl("a"), Tbl("b"))))
    assert(parse("outer(inner(a,b),c)") ==
      Node("outer", Seq(Node("inner", Seq(Tbl("a"), Tbl("b"))), Tbl("c"))))
    assertThrows[IllegalArgumentException](CompositeJoin.run("bogus(a)", "k",
      Map("a" -> spark.range(1).toDF("k"))))
  }

  test("inner: tuple iff ALL sources have the key (InnerJoinRecordReader:45)") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "va")
    val b = Seq((2, "b2"), (3, "b3")).toDF("k", "vb")
    val got = CompositeJoin.run("inner(a,b)", "k", Map("a" -> a, "b" -> b))
      .as[(Int, String, String)].collect().toSet
    assert(got == Set((2, "a2", "b2")))
  }

  test("outer: tuple if ANY source has the key (OuterJoinRecordReader:45)") {
    import spark.implicits._
    val a = Seq((1, "a1")).toDF("k", "va")
    val b = Seq((2, "b2")).toDF("k", "vb")
    val got = CompositeJoin.run("outer(a,b)", "k", Map("a" -> a, "b" -> b))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a1", null), (2, null, "b2")))
  }

  test("override: rightmost source wins (OverrideRecordReader:56)") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2"), (3, "a3")).toDF("k", "v")
    val b = Seq((2, "b2")).toDF("k", "v")
    val c = Seq((3, "c3")).toDF("k", "v")
    val got = CompositeJoin.run("override(a,b,c)", "k", Map("a" -> a, "b" -> b, "c" -> c))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "a1"), (2, "b2"), (3, "c3")))
  }
}
