package graft.ops

import graft.SparkTestBase
import graft.ops.FieldSelection._

class FieldSelectionSpec extends SparkTestBase {

  test("spec parser: singles, ranges, open ranges, key:value split") {
    assert(parseList("6,5,1-3") == Seq(Single(6), Single(5), Range(1, 3)))
    assert(parseList("0-") == Seq(OpenRange(0)))
    val (k, v) = parseKeyValue("6,5,1-3:0-")
    assert(k == Seq(Single(6), Single(5), Range(1, 3)))
    assert(v == Seq(OpenRange(0)))
    // no colon → value defaults to all fields
    val (k2, v2) = parseKeyValue("2")
    assert(k2 == Seq(Single(2)) && v2 == Seq(OpenRange(0)))
  }

  test("extractFields semantics on lines (reference FieldSelectionHelper:79)") {
    import spark.implicits._
    val df = Seq("a-b-c-d-e", "x-y-z").toDF("line")
    val out = FieldSelection.selectFields(df, "line", "1,0:2-", sep = "-")
      .select("fs_key", "fs_value").as[(String, String)].collect().toSet
    assert(out.contains(("b-a", "c-d-e")))
    assert(out.contains(("y-x", "z")))
  }

  test("out-of-range fields vanish instead of throwing (ANSI-safe)") {
    import spark.implicits._
    val df = Seq("only-two").toDF("line")
    val out = FieldSelection.selectFields(df, "line", "5:0-", sep = "-")
      .select("fs_key").as[String].collect()
    assert(out.head == "")
  }
}
