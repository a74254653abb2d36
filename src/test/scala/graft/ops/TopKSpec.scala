package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TopKSpec extends SparkTestBase {

  test("bounded top-k per group equals the window formulation exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map(i =>
      (i.toLong % 37, rnd.nextInt(100).toDouble, i.toLong))
    val df = rows.toDF("key", "ord", "tag").repartition(8)
    val got = TopK.topKPerGroup(df, "key", "ord", "tag", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    import org.apache.spark.sql.expressions.Window
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy($"key").orderBy($"ord".desc, $"tag")))
      .filter($"rank" <= 5)
      .select($"key", $"tag", $"ord", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want) // same rows, same ranks, deterministic ties
  }

  test("groups smaller than k return all rows, ranked") {
    import spark.implicits._
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L), (2L, 9.0, 12L))
      .toDF("key", "ord", "tag")
    val got = TopK.topKPerGroup(df, "key", "ord", "tag", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == Set((1L, 10L, 1), (1L, 11L, 2), (2L, 12L, 1)))
  }

  test("string-keyed variant: same (ord desc, tag asc) ranking per group") {
    import spark.implicits._
    val df = Seq(("a", 3.0, 10L), ("a", 1.0, 11L), ("b", 9.0, 12L),
      ("a", 3.0, 9L)).toDF("key", "ord", "tag")
    val got = TopK.topKPerGroupStr(df, "key", "ord", "tag", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    // ties on ord broken by ascending tag: 9 ranks before 10
    assert(got == Set(("a", 9L, 1), ("a", 10L, 2), ("b", 12L, 1)))
  }

  test("partial aggregation: shuffle carries at most k rows per group per task") {
    import spark.implicits._
    // plan-level: the typed aggregator appears as a two-phase (partial +
    // final) ObjectHashAggregate, i.e. map-side combine is in effect
    val df = (0 until 1000).map(i => (i.toLong % 7, i.toDouble, i.toLong))
      .toDF("key", "ord", "tag").repartition(4)
    val plan = TopK.topKPerGroup(df, "key", "ord", "tag", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    assert("(?i)partial".r.findFirstIn(plan).isDefined, plan)
  }

  test("NaN ords rank first and results are partition-count-independent") {
    import spark.implicits._
    // cosine of a zero-norm vector is NaN; primitive comparisons would
    // place it by insertion order — Double.compare makes NaN greatest
    val rows = Seq((1L, Double.NaN, 100L), (1L, 9.0, 1L), (1L, 8.0, 2L),
      (1L, 7.0, 3L), (1L, Double.NaN, 99L))
    def run(parts: Int) =
      TopK.topKPerGroup(rows.toDF("key", "ord", "tag").repartition(parts),
          "key", "ord", "tag", k = 3)
        .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    val single = run(1)
    assert(single == Set((99L, 1), (100L, 2), (1L, 3))) // NaN first, tag asc
    assert(run(8) == single)
  }

  test("non-numeric tag column fails fast with a clear contract error") {
    import spark.implicits._
    val df = Seq(("a", 1.0, "doc-1")).toDF("key", "ord", "tag")
    val e = intercept[IllegalArgumentException] {
      TopK.topKPerGroupStr(df, "key", "ord", "tag", k = 1)
    }
    assert(e.getMessage.contains("must be numeric"))
  }
}
