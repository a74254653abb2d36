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

  test("segment-pruned linkage equals the block-joined form, including cross-block exclusion") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // names sharing a boilerplate prefix (the LCP-strip degeneracy) with
    // random digit tails; b perturbs half the names by one deletion and
    // scatters some records into a different block
    val a = (1L to 120L).map { i =>
      (i, f"Account#${rnd.nextInt(100000)}%05d", (i % 4).toInt)
    }.toDF("a_id", "a_name", "nat")
    val aRows = a.as[(Long, String, Int)].collect()
    val b = aRows.map { case (i, name, nat) =>
      val perturbed = if (i % 2 == 0) name.patch(8 + rnd.nextInt(5), "", 1) else name
      val block = if (i % 17 == 0) 9 else nat  // some cross-block strays
      (i + 1000L, perturbed, block)
    }.toSeq.toDF("b_id", "b_name", "nat")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("b_id", "a_id", "dist").as[(Long, Long, Int)].collect().toSet
    val plain = run(EntityResolution.linkBest(a, b, Seq("nat"),
      "a_id", "b_id", "a_name", "b_name", maxDist = 1))
    val pruned = run(EntityResolution.linkBestPruned(a, b, Seq("nat"),
      "a_id", "b_id", "a_name", "b_name", maxDist = 1))
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }
}
