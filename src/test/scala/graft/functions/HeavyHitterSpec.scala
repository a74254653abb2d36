package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.FrequentItems

/** Misra–Gries sketch guarantees ([[HeavyHitterSketch]]) and the exact
  * two-pass heavy hitters built on it ([[FrequentItems]]). The
  * guarantees must hold under ANY partitioning / merge order, so every
  * property is checked across several partition counts, on the
  * adversarial shapes that break naive counters: all-distinct streams
  * (maximum purge pressure), a single hot key in noise (the item must
  * survive every purge), and a zipf-ish head (multiple survivors with
  * different margins).
  */
class HeavyHitterSpec extends SparkTestBase {

  private def sketch(items: Seq[String], k: Int, parts: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.parallelize(items, parts).toDF("t")
      .agg(expr(s"graft_heavy_hitters(t, $k)").as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def checkGuarantees(items: Seq[String], k: Int, parts: Int): Unit = {
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    val out = sketch(items, k, parts)
    assert(out.size <= 2 * k, s"summary exceeded 2k entries: ${out.size}")
    val bound = n / (k + 1)
    // an all-cancelled (empty) summary is legitimate MG output — its err
    // is not observable from the rows, but is still ≤ n/(k+1), so the
    // presence guarantee degrades to the theoretical bound
    val err = if (out.isEmpty) bound else out.head._3
    assert(err <= bound,
      s"err $err above the n/(k+1) bound $bound (n=$n, k=$k, parts=$parts)")
    // every stored estimate brackets the true count
    out.foreach { case (item, est, e) =>
      val t = truth(item)
      assert(est <= t && t <= est + e,
        s"estimate out of bracket for '$item': est=$est err=$e true=$t")
    }
    // every item heavier than err is present
    val present = out.map(_._1).toSet
    truth.foreach { case (item, t) =>
      if (t > err) assert(present.contains(item),
        s"missing heavy item '$item' (true=$t > err=$err, parts=$parts)")
    }
  }

  private val shapes: Map[String, Seq[String]] = Map(
    // all-distinct: every add past capacity forces purge pressure
    "all_distinct" -> (0 until 5000).map(i => s"u$i"),
    // one hot key buried in distinct noise
    "hot_in_noise" -> (Seq.fill(800)("hot") ++ (0 until 4200).map(i => s"u$i")),
    // zipf-ish head over a distinct tail
    "zipf_head" -> ((1 to 8).flatMap(r => Seq.fill(1600 / r)(s"w$r")) ++
      (0 until 2000).map(i => s"u$i")))

  test("MG guarantees hold on adversarial shapes across partitionings") {
    for {
      (name, base) <- shapes
      parts <- Seq(1, 7, 32)
      k <- Seq(5, 20)
    } {
      // deterministic shuffle of the stream order (seeded), so the purge
      // schedule differs between partitionings
      val rnd = new scala.util.Random(42)
      checkGuarantees(rnd.shuffle(base), k, parts)
      val _ = name
    }
  }

  test("grouped sketch: per-group state, per-group guarantees") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rows = (0 until 3).flatMap { g =>
      Seq.fill(500)((s"g$g", s"hot$g")) ++
        (0 until 1500).map(i => (s"g$g", s"g${g}u$i"))
    }
    val out = spark.sparkContext.parallelize(rows, 16).toDF("g", "t")
      .groupBy($"g").agg(expr("graft_heavy_hitters(t, 10)").as("hh"))
      .select($"g", explode($"hh").as("h"))
      .select($"g", $"h.item", $"h.est", $"h.err")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    for (g <- 0 until 3) {
      val mine = out.filter(_._1 == s"g$g")
      val err = mine.head._4
      assert(err <= 2000 / 11) // n_group/(k+1)
      val hot = mine.find(_._2 == s"hot$g")
      assert(hot.isDefined, s"hot$g missing from its group summary")
      assert(hot.get._3 <= 500 && 500 <= hot.get._3 + err)
    }
  }

  test("serialize/deserialize roundtrip preserves counters, err, capacity") {
    val s = new HeavyHitterSketch.Summary(4)
    (0 until 100).foreach(i =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(s"x${i % 9}")))
    val back = HeavyHitterSketch.Summary.fromBytes(s.toBytes)
    assert(back.k == s.k && back.err == s.err && back.size == s.size)
    assert(back.toBytes.sameElements(s.toBytes))
  }

  test("analysis rejects mistyped calls; NULL items are skipped") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("t")
    df.createOrReplaceTempView("hh_in")
    // k not a literal
    intercept[AnalysisException] {
      spark.sql("SELECT graft_heavy_hitters(t, length(t)) FROM hh_in").collect()
    }
    // k wrong type
    intercept[AnalysisException] {
      spark.sql("SELECT graft_heavy_hitters(t, 'five') FROM hh_in").collect()
    }
    // item wrong type
    intercept[AnalysisException] {
      spark.sql("SELECT graft_heavy_hitters(struct(t), 5) FROM hh_in").collect()
    }
    val out = spark.sql(
      "SELECT inline(graft_heavy_hitters(t, 5)) FROM hh_in").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L), ("b", 1L)))
  }

  test("exactHeavyHitters == naive groupBy/filter on every shape and phi") {
    import spark.implicits._
    for {
      (_, base) <- shapes
      parts <- Seq(1, 13)
      phi <- Seq(0.01, 0.1, 0.6) // 0.6: provably-empty result
    } {
      val df = spark.sparkContext.parallelize(base, parts).toDF("t")
      val got = FrequentItems.exactHeavyHitters(df, "t", phi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val n = base.size.toLong
      val want = base.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 > phi * n).toSeq
        .sortBy { case (item, c) => (-c, item) }
      assert(got == want, s"phi=$phi parts=$parts")
    }
  }
}
