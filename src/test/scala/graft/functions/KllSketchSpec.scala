package graft.functions

import graft.SparkTestBase
import graft.ops.Quantiles
import org.apache.spark.sql.functions._

/** Pins for the KLL quantile sketch: exactness below capacity, total
  * weight preservation under arbitrary partitioning (the merge is
  * weight-lossless by construction), the rank-error bound on random
  * data, and agreement with the exact path on the real fixture.
  */
class KllSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val specs =
    Seq(("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))

  test("below capacity the sketch IS the data: approx == exact") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map(_ => ("g", rnd.nextLong() % 100000))
    val exact = Quantiles.exactQuantiles(rows.toDF("g", "v"), "g", col("v"), specs)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    val approx = Quantiles.approxQuantiles(rows.toDF("g", "v"), "g", col("v"), specs, k = 512)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(approx === exact)
  }

  test("total weight equals n for any partitioning") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    val values = (1 to 100000).map(_ => rnd.nextLong() % 1000000)
    for (parts <- Seq(1, 7, 32)) {
      val df = values.toDF("v").repartition(parts)
      val total = df.agg(call_function("graft_kll", col("v"), lit(64)).as("sk"))
        .select(explode(col("sk")).as("e")).agg(sum("e.w")).head().getLong(0)
      assert(total === values.length.toLong, s"parts=$parts")
    }
  }

  test("rank error within the levels*n/k bound on 200k random values") {
    val rnd = new scala.util.Random(11)
    val n = 200000
    val k = 512
    val values = Array.fill(n)(rnd.nextLong() % 10000000)
    val sorted = values.sorted
    val got = Quantiles.approxQuantiles(
        values.toSeq.toDF("v").select(lit("g").as("g"), col("v")), "g", col("v"), specs, k)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    // analytic-shape bound: each level compaction perturbs ranks by its
    // weight; levels ~ log2(n/k) + 1
    val levels = (math.log(n.toDouble / k) / math.log(2)).ceil.toInt + 1
    val bound = levels.toLong * n / k
    for ((p, num, den) <- specs) {
      val target = (num.toLong * n + den - 1) / den
      val est = got(p)
      // true rank range of the estimate in the sorted data (1-based)
      val lo = java.util.Arrays.binarySearch(sorted, est) match {
        case i if i >= 0 => // first occurrence
          var j = i; while (j > 0 && sorted(j - 1) == est) j -= 1; j + 1
        case i => -i // insertion point + 1 - 1
      }
      var hiIdx = java.util.Arrays.binarySearch(sorted, est)
      if (hiIdx >= 0) { while (hiIdx < n - 1 && sorted(hiIdx + 1) == est) hiIdx += 1 }
      else hiIdx = -hiIdx - 2
      val hi = hiIdx + 1
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= bound, s"$p: rank err $err > bound $bound (target $target, est covers [$lo,$hi])")
    }
  }

  test("rollup: single-sketch re-aggregation is an exact roundtrip") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(17)
    val values = (1 to 50000).map(_ => rnd.nextLong() % 1000000)
    val sk = values.toDF("v")
      .agg(call_function("graft_kll", col("v"), lit(64)).as("sk"))
    // atoms of the original summary
    def atoms(df: org.apache.spark.sql.DataFrame, c: String) = df
      .select(explode(col(c)).as("e")).select("e.v", "e.w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // feeding ONE summary's output atoms back through graft_kll_merge
    // reconstructs the identical per-level multisets (no level reaches k
    // during re-insertion, so no compaction fires)
    val merged = sk.agg(call_function("graft_kll_merge", col("sk"), lit(64)).as("m"))
    assert(atoms(merged, "m") === atoms(sk, "sk"))
  }

  test("rollup: per-unit sketch table preserves weight and meets the error bound") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    val n = 120000
    val k = 512
    // 40 "days" of data, one sketch per day, rolled up to one group
    val rows = (1 to n).map(i => ("g", i % 40, rnd.nextLong() % 10000000))
    val df = rows.toDF("g", "day", "v")
    val sketches = Quantiles.sketchTable(df, "g", "day", col("v"), k)
    assert(sketches.count() === 40L)
    // weight conservation through BOTH aggregation levels
    val total = sketches
      .agg(call_function("graft_kll_merge", col("sketch"), lit(k)).as("m"))
      .select(explode(col("m")).as("e")).agg(sum("e.w")).head().getLong(0)
    assert(total === n.toLong)
    // rolled-up quantiles stay within the (slightly looser) merged bound:
    // the merge adds at most one extra compaction generation per level
    val got = Quantiles.rollupQuantiles(sketches, "g", "sketch", specs, k)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    val sorted = rows.map(_._3).sorted.toArray
    val levels = (math.log(n.toDouble / k) / math.log(2)).ceil.toInt + 1
    val bound = 2L * levels * n / k
    for ((p, num, den) <- specs) {
      val target = (num.toLong * n + den - 1) / den
      val est = got(p)
      val lo = sorted.count(_ < est) + 1
      val hi = sorted.count(_ <= est)
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= bound, s"$p: rank err $err > bound $bound")
    }
    // regrouping the same sketch rows (days 0-19 vs 20-39) still conserves
    // weight per regroup — the subset-query shape a sketch table exists for
    val split = sketches.withColumn("half", (col("u") < 20).cast("string"))
    val perHalf = Quantiles.rollupQuantiles(split, "half", "sketch",
        Seq(("p50", 1, 2)), k)
    assert(perHalf.count() === 2L)
  }

  test("rollup: sketch table survives parquet bit-for-bit (the persisted-artifact path)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(29)
    val df = (1 to 30000).map(i => ("g", i % 10, rnd.nextLong() % 100000))
      .toDF("g", "day", "v")
    // persist: partial-buffer merge order inside the sketch agg is
    // timing-dependent, so two computations of the plan can produce
    // different (equally valid) summaries — compare against the ONE
    // materialization that was written
    val sketches = Quantiles.sketchTable(df, "g", "day", col("v"), 128).persist()
    val dir = java.nio.file.Files.createTempDirectory("kll_roundtrip").toString
    sketches.write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    def rows(t: org.apache.spark.sql.DataFrame) = t
      .select(col("g"), col("u"), explode(col("sketch")).as("e"))
      .select(col("g"), col("u"), col("e.v"), col("e.w"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    // parquet roundtrip is lossless on the sketch column — the saved
    // artifact IS the in-memory sketch table, so rolling up from disk
    // answers exactly what the in-session rows would
    assert(rows(loaded) === rows(sketches))
    val total = Quantiles.rollupQuantiles(loaded, "g", "sketch",
        Seq(("p50", 1, 2)), 128)
    assert(total.count() === 1L)
  }

  test("orders fixture: sketch deciles within 2% rank error of exact") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val n = orders.count()
    val cents = (round(col("o_totalprice") * 100)).cast("long")
    val exactVals = orders.select(cents.as("v")).orderBy("v")
      .collect().map(_.getLong(0))
    val got = Quantiles.approxQuantiles(orders, "o_orderstatus", cents, specs, k = 512)
    // every (status, p) answered exactly once
    assert(got.count() === 3L * specs.length)
    // global-group sanity on the largest status: rank error <= 2% of n
    val gotO = Quantiles.approxQuantiles(
        orders.select(lit("all").as("s"), cents.as("v")), "s", col("v"), specs, k = 512)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    for ((p, num, den) <- specs) {
      val target = (num.toLong * n + den - 1) / den
      val est = gotO(p)
      val rank = exactVals.count(_ <= est)
      val lo = exactVals.count(_ < est) + 1
      val err = if (target < lo) lo - target else if (target > rank) target - rank else 0L
      assert(err <= (n * 0.02).toLong + 1, s"$p: rank err $err at n=$n")
    }
  }
}
