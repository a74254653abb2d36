package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for [[Quantiles.exactQuantiles]]: the distributed value-count +
  * cumulative-rank construction must agree with the definition — the
  * element at 1-based rank ceil(p·n) of the sorted multiset — on
  * randomized data (duplicates included; the groupBy collapses them, the
  * cnt ranges must re-expand them correctly) and on the degenerate
  * shapes (single value, all-distinct, n smaller than the denominator).
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private val specs =
    Seq(("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))

  private def reference(values: Seq[Long]): Map[String, Long] = {
    val sorted = values.sorted
    val n = sorted.length
    specs.map { case (p, num, den) =>
      p -> sorted((num.toLong * n + den - 1).toInt / den - 1)
    }.toMap
  }

  private def run(rows: Seq[(String, Long)]): Map[(String, String), Long] =
    Quantiles.exactQuantiles(rows.toDF("g", "v"), "g", col("v"), specs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("randomized groups with heavy duplication match the sorted-multiset definition") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 1 to 200 + rnd.nextInt(100)
    } yield (g, rnd.nextInt(20).toLong) // 20 distinct values over ~250 rows: dense ties
    val got = run(rows)
    for (g <- Seq("a", "b", "c"); (p, want) <- reference(rows.filter(_._1 == g).map(_._2)))
      assert(got((g, p)) === want, s"group=$g p=$p")
  }

  test("single-value group: every quantile is that value") {
    val got = run(Seq.fill(9)(("x", 42L)))
    assert(got === specs.map { case (p, _, _) => ("x", p) -> 42L }.toMap)
  }

  test("n smaller than the denominator still selects by ceil rank") {
    // n=3: p10 -> rank ceil(0.3)=1, p50 -> rank 2, p90 -> rank 3
    val got = run(Seq(("x", 10L), ("x", 20L), ("x", 30L)))
    assert(got(("x", "p10")) === 10L)
    assert(got(("x", "p50")) === 20L)
    assert(got(("x", "p90")) === 30L)
    assert(got === reference(Seq(10L, 20L, 30L)).map { case (p, v) => ("x", p) -> v })
  }

  test("exactly one row per (group, quantile)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => ("g" + (i % 4), rnd.nextInt(50).toLong))
    val out = Quantiles.exactQuantiles(rows.toDF("g", "v"), "g", col("v"), specs)
    assert(out.count() === 4L * specs.length)
    assert(out.groupBy("g", "p").count().filter(col("count") > 1).count() === 0L)
  }
}
