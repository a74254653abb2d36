package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for grid resample + forward fill: equality with a sequential
  * reference, per-bucket latest-wins selection, no leading fill before a
  * key's first observation, partitioning invariance, and the per-key
  * window plan property (no single-partition exchange anywhere). */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("matches a sequential reference on a gappy synthetic series") {
    val rnd = new scala.util.Random(61)
    val step = 10L
    // sparse observations: ~1 in 4 buckets occupied, several per bucket
    val rows = for {
      k <- 0 until 8
      i <- 1 to 60
      if rnd.nextInt(4) == 0
    } yield (k, 1000L + rnd.nextInt(600), rnd.nextInt(1000).toDouble)
    // make (k, ts) unique: keep one row per (k, sec)
    val uniq = rows.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
    val df = uniq.map { case (k, sec, v) => (k, ts(sec), v) }
      .toDF("k", "t", "v")
    val got = Resample.gapFill(df, "k", "t", col("v"), step)
      .as[(Int, Long, Double, Long)].collect()
      .map { case (k, b, v, n) => (k, b) -> (v, n) }.toMap

    uniq.groupBy(_._1).foreach { case (k, obs) =>
      val byBucket = obs.groupBy(o => o._2 / step * step)
      val mn = byBucket.keys.min
      val mx = byBucket.keys.max
      var lastV = Double.NaN
      (mn to mx by step).foreach { b =>
        val inBucket = byBucket.getOrElse(b, Seq())
        if (inBucket.nonEmpty) lastV = inBucket.maxBy(_._2)._3
        val (v, n) = got((k, b))
        assert(n === inBucket.size.toLong, s"key $k bucket $b count")
        assert(v === lastV, s"key $k bucket $b value")
      }
      // grid is exactly the key's own span
      assert(got.keys.count(_._1 == k) === ((mx - mn) / step + 1))
    }
  }

  test("single-observation key yields exactly one grid row") {
    val df = Seq((7, ts(12345), 9.5)).toDF("k", "t", "v")
    val out = Resample.gapFill(df, "k", "t", col("v"), 60L)
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(out === Seq((7, 12300L, 9.5, 1L)))
  }

  test("result is invariant under repartitioning") {
    val rnd = new scala.util.Random(67)
    val rows = (1 to 400).map(i =>
      (i % 5, ts(5000L + i * 7), rnd.nextInt(100).toDouble))
    def run(parts: Int) =
      Resample.gapFill(rows.toDF("k", "t", "v").repartition(parts),
          "k", "t", col("v"), 30L)
        .as[(Int, Long, Double, Long)].collect().toSet
    assert(run(2) === run(19))
  }

  test("plan pin: windows are per-key — no SinglePartition exchange") {
    val df = (1 to 100).map(i => (i % 4, ts(1000L + i), i.toDouble))
      .toDF("k", "t", "v")
    val plan = Resample.gapFill(df, "k", "t", col("v"), 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"gap fill plan serializes through one partition:\n$plan")
  }
}
