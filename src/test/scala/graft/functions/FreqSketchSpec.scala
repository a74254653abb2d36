package graft.functions

import graft.SparkTestBase
import graft.ops.FreqCounts
import org.apache.spark.sql.functions._

/** Pins for the Count-Min frequency sketch: the exact sparse regime, the
  * canonical-bytes merge-order invariance (counter sums + sorted sparse
  * map ⇒ the binary is a pure function of the input multiset), the
  * sparse→dense consistency, the one-sided (ε, δ) dense error bound, and
  * the build→rollup→probe warehouse lifecycle on the real fixture.
  */
class FreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("sparse mode is exact: every point query equals the true count, absent keys 0") {
    val rnd = new scala.util.Random(17)
    // 5000 draws from a 1000-key domain, w/4 = 4096 bound -> sparse
    val data = (1 to 5000).map(_ => rnd.nextInt(1000).toLong)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = data.toDF("v").withColumn("g", lit("g"))
    val sk = FreqCounts.sketchCounts(df, "g", col("v"), d = 3, w = 16384)
    val probes = (0L until 1200L).toDF("key") // includes absent keys
    val got = FreqCounts.pointQueries(sk, col("sketch"), probes, col("key"))
      .select("key", "freq").as[(Long, Long)].collect().toMap
    (0L until 1200L).foreach { k =>
      assert(got(k) === truth.getOrElse(k, 0L), s"key $k")
    }
  }

  test("canonical bytes are invariant under partitioning, in BOTH modes") {
    GraftFunctions.register(spark)
    def sketchBytes(domain: Int, w: Int, parts: Int): Seq[Byte] = {
      val rnd = new scala.util.Random(23)
      val df = (1 to 20000).map(_ => rnd.nextInt(domain).toLong).toDF("v")
        .repartition(parts)
      df.agg(call_function("graft_cms", col("v"), lit(3), lit(w)).as("sk"))
        .head().getAs[Array[Byte]](0).toSeq
    }
    // sparse: 300 distinct keys < w/4 = 256? no — use w=4096, bound 1024
    assert(sketchBytes(300, 4096, 3) === sketchBytes(300, 4096, 13))
    // dense: 3000 distinct keys > 1024
    assert(sketchBytes(3000, 4096, 3) === sketchBytes(3000, 4096, 13))
  }

  test("dense mode never undercounts and respects the e/w·N bound on the fixture") {
    val rnd = new scala.util.Random(29)
    // zipf-ish: key k with multiplicity ~ 1/(k+1)
    val data = (0 until 3000).flatMap(k => Seq.fill(3000 / (k + 1) max 1)(k.toLong))
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = data.size.toLong
    val d = 4
    val w = 2048 // 3000 distinct > w/4 -> dense
    val df = rnd.shuffle(data).toDF("v").withColumn("g", lit("g"))
    val sk = FreqCounts.sketchCounts(df, "g", col("v"), d = d, w = w)
    val probes = (0L until 3000L).toDF("key")
    val got = FreqCounts.pointQueries(sk, col("sketch"), probes, col("key"))
      .select("key", "freq").as[(Long, Long)].collect().toMap
    val eps = math.E / w
    var over = 0
    truth.foreach { case (k, t) =>
      assert(got(k) >= t, s"CM undercounted key $k: ${got(k)} < $t")
      if (got(k) > t + (eps * n).toLong) over += 1
    }
    // P(overshoot beyond eps*N) <= e^-d per key; allow generous slack
    assert(over <= math.max(5, (truth.size * 2 * math.exp(-d)).toInt),
      s"$over of ${truth.size} keys exceeded the eps*N overcount bound")
  }

  test("merging per-group sketches == sketching the union (binary equality)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(31)
    val rows = (1 to 8000).map(i => (s"g${i % 5}", rnd.nextInt(2000).toLong))
    val df = rows.toDF("g", "v")
    val perGroup = FreqCounts.sketchCounts(df, "g", col("v"), d = 3, w = 4096)
    val merged = FreqCounts.rollupSketches(perGroup, lit(1), col("sketch"),
        d = 3, w = 4096)
      .head().getAs[Array[Byte]]("sketch").toSeq
    val direct = FreqCounts.sketchCounts(
        df.withColumn("g", lit("all")), "g", col("v"), d = 3, w = 4096)
      .head().getAs[Array[Byte]]("sketch").toSeq
    assert(merged === direct)
  }

  test("warehouse lifecycle on lineitem: per-flag sketches roll up to exact global counts") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val perFlag = FreqCounts.sketchCounts(li, "l_returnflag", col("l_suppkey"))
    assert(perFlag.count() >= 2) // one sketch row per flag
    val global = FreqCounts.rollupSketches(perFlag, lit(1), col("sketch"))
    val probes = (0L until 10L).toDF("key")
    val got = FreqCounts.pointQueries(global, col("sketch"), probes, col("key"))
      .select("key", "freq").as[(Long, Long)].collect().toMap
    val truth = li.filter(col("l_suppkey") < 10)
      .groupBy(col("l_suppkey").cast("long").as("k")).count()
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { k =>
      assert(got(k) === truth.getOrElse(k, 0L), s"suppkey $k")
    }
  }
}
