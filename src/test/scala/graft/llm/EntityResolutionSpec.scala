package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Linkage correctness on a controlled fixture + the plan property that
  * separates blocked linkage from an accidental all-pairs join. */
class EntityResolutionSpec extends SparkTestBase {

  test("finds the true source under a 1-char edit; unmatched stays out") {
    import spark.implicits._
    val a = Seq((1L, "alice johnson", 10), (2L, "bob smith", 10),
      (3L, "carol jones", 20)).toDF("a_id", "a_name", "nat")
    val b = Seq((101L, "alice jonson", 10),  // 1 deletion from a_id=1
      (102L, "bob smith", 10),               // exact
      (103L, "zzzzzzzz", 20))                // no candidate within 1
      .toDF("b_id", "b_name", "nat")
    val out = EntityResolution.linkBest(a, b, Seq("nat"),
        "a_id", "b_id", "a_name", "b_name", maxDist = 1)
      .select("b_id", "a_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((101L, 1L, 1), (102L, 2L, 0)))
  }

  test("blocking prevents cross-block matches and cross joins") {
    import spark.implicits._
    // same name, different block: must NOT match
    val a = Seq((1L, "dana white", 10)).toDF("a_id", "a_name", "nat")
    val b = Seq((201L, "dana white", 99)).toDF("b_id", "b_name", "nat")
    val out = EntityResolution.linkBest(a, b, Seq("nat"),
      "a_id", "b_id", "a_name", "b_name", maxDist = 1)
    assert(out.count() == 0)
    // plan: an equi-join on the block key, never a cartesian product
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"linkage degenerated to all-pairs:\n$plan")
  }
}
