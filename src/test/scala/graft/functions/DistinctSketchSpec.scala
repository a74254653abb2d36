package graft.functions

import graft.SparkTestBase
import graft.ops.DistinctCounts
import org.apache.spark.sql.functions._

/** Pins for the HLL distinct-count sketch: the exact sparse regime, the
  * canonical-bytes merge-order invariance (sketch binary is a pure
  * function of the distinct-key set — stronger than KLL can promise),
  * the sparse→dense transition consistency, the dense error bound, and
  * the persisted-sketch-table lifecycle on the real fixture.
  */
class DistinctSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("sparse mode is exact: estimate == count distinct, long and string keys") {
    val rnd = new scala.util.Random(11)
    // 3000 draws from a 2500-value domain -> duplicates present,
    // distinct count < m/4 = 4096 at p=14 -> stays sparse
    val longs = (1 to 3000).map(_ => ("g", rnd.nextInt(2500).toLong))
    val df = longs.toDF("g", "v")
    val got = DistinctCounts.sketchCounts(df, "g", col("v"), p = 14)
      .head().getLong(1)
    assert(got === df.select("v").distinct().count())

    val strs = longs.map { case (g, v) => (g, s"key-$v") }.toDF("g", "v")
    val gotS = DistinctCounts.sketchCounts(strs, "g", col("v"), p = 14)
      .head().getLong(1)
    assert(gotS === strs.select("v").distinct().count())
  }

  test("canonical bytes are invariant under partitioning, in BOTH modes") {
    GraftFunctions.register(spark)
    def sketchBytes(domain: Int, p: Int, parts: Int): Seq[Byte] = {
      val rnd = new scala.util.Random(13)
      val df = (1 to 20000).map(_ => rnd.nextInt(domain).toLong).toDF("v")
        .repartition(parts)
      df.agg(call_function("graft_hll", col("v"), lit(p)).as("sk"))
        .head().getAs[Array[Byte]](0).toSeq
    }
    for (domain <- Seq(800, 50000)) { // sparse (800 < m/4 = 1024) and dense
      val ref = sketchBytes(domain, 12, 1)
      for (parts <- Seq(3, 17, 32))
        assert(sketchBytes(domain, 12, parts) === ref,
          s"domain=$domain parts=$parts")
    }
  }

  test("merging saved sketches == sketching the union; exact while sparse") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(17)
    // two units with overlapping keys: naive count addition would give
    // 2600; the sketch union must give the true distinct count
    val a = (1 to 1500).map(i => ("u1", rnd.nextInt(1300).toLong))
    val b = (1 to 1100).map(i => ("u2", (rnd.nextInt(1300) + 650).toLong))
    val df = (a ++ b).toDF("u", "v").withColumn("g", lit("all"))
    val table = DistinctCounts.sketchTable(df, "g", "u", col("v"), p = 14)
    assert(table.count() === 2L)
    val rolled = DistinctCounts.rollupCounts(table, "g", "sketch", p = 14)
      .head().getLong(1)
    assert(rolled === df.select("v").distinct().count())
  }

  test("dense estimate within 5% on 100k distinct at p=12 (sigma ~ 1.6%)") {
    val df = (0 until 100000).map(i => ("g", i.toLong * 2654435761L + 17)).toDF("g", "v")
    val est = DistinctCounts.sketchCounts(df, "g", col("v"), p = 12)
      .head().getLong(1)
    val exact = 100000.0
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est")
  }

  test("sketch table survives parquet and answers from the cold table") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(19)
    val df = (1 to 8000).map(i => ("g" + i % 3, "u" + i % 7, rnd.nextInt(900).toLong))
      .toDF("g", "u", "v")
    val table = DistinctCounts.sketchTable(df, "g", "u", col("v"), p = 14)
    val dir = java.nio.file.Files.createTempDirectory("hll_roundtrip").toString
    table.write.mode("overwrite").parquet(dir)
    // canonical bytes -> the loaded rows are literally the written rows,
    // and the rollup from disk must equal an exact distinct per group
    val rolled = DistinctCounts.rollupCounts(spark.read.parquet(dir), "g", "sketch", p = 14)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled === exact)
  }

  test("orders fixture: distinct_rollup path equals count distinct dates") {
    val d = sf0001
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    val table = DistinctCounts.sketchTable(
      orders, "o_orderstatus", "month", col("o_orderdate"), p = 14)
    val got = DistinctCounts.rollupCounts(table, "g", "sketch", p = 14)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_orderdate")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("degenerate inputs: empty group set and all-null keys count zero") {
    GraftFunctions.register(spark)
    val allNull = Seq(("g", null.asInstanceOf[java.lang.Long]), ("g", null))
      .toDF("g", "v")
    val est = DistinctCounts.sketchCounts(allNull, "g", col("v"), p = 12)
      .head().getLong(1)
    assert(est === 0L)
  }

  test("sparse intersection is the exact set intersection, including empty and full overlap") {
    GraftFunctions.register(spark)
    def sketchOf(keys: Seq[Long]): Array[Byte] =
      keys.toDF("v").agg(call_function("graft_hll", col("v"), lit(14)).as("sk"))
        .head().getAs[Array[Byte]](0)
    def intersect(a: Seq[Long], b: Seq[Long]): Long = {
      val df = Seq((sketchOf(a), sketchOf(b))).toDF("a", "b")
      df.select(call_function("graft_hll_intersect", col("a"), col("b")))
        .head().getLong(0)
    }
    val rnd = new scala.util.Random(79)
    val xs = (1 to 1500).map(_ => rnd.nextInt(3000).toLong).distinct
    val ys = (1 to 1500).map(_ => rnd.nextInt(3000).toLong + 1500L).distinct
    assert(intersect(xs, ys) === (xs.toSet intersect ys.toSet).size.toLong)
    assert(intersect(xs, xs) === xs.size.toLong)
    assert(intersect(xs, Seq(900000L)) === 0L)
  }

  test("dense intersection: inclusion-exclusion stays within the compounded error bound") {
    GraftFunctions.register(spark)
    val p = 12
    val m = 1 << p
    // two 20k-key sets with a 10k-key true overlap -> both dense at p=12
    val a = (0L until 20000L)
    val b = (10000L until 30000L)
    def sk(keys: Seq[Long]): Array[Byte] =
      keys.toDF("v").agg(call_function("graft_hll", col("v"), lit(p)).as("sk"))
        .head().getAs[Array[Byte]](0)
    val got = Seq((sk(a), sk(b))).toDF("a", "b")
      .select(call_function("graft_hll_intersect", col("a"), col("b")))
      .head().getLong(0)
    // inclusion-exclusion compounds three +-1.04/sqrt(m) estimates over
    // set sizes up to 30k; allow 6 sigma of the largest term
    val tol = (6 * 1.04 / math.sqrt(m) * 30000).toLong
    assert(math.abs(got - 10000L) <= tol, s"got $got, want 10000 +- $tol")
  }
}
