package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  test("salted two-phase agg equals plain agg on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"key${i % 7}" else "HOT", i.toLong))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"), buckets = 16,
        ("sum", "v", "sv"), ("count", "v", "n"), ("min", "v", "mn"), ("max", "v", "mx"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val plain = df.groupBy($"k")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"), min($"v"), max($"v"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join; phase-1 groups are actually spread") {
    import spark.implicits._
    val fact = (1 to 5000).map(i => (if (i % 5 == 0) i % 3 else 0, i.toLong)).toDF("k", "v")
    val dim = Seq((0, "hot"), (1, "one"), (2, "two")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
      .groupBy($"name").agg(sum($"v").as("sv")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = fact.join(dim, "k")
      .groupBy($"name").agg(sum($"v").as("sv")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    // the hot key's fact rows carry >1 distinct salt (the point of salting)
    val saltSpread = fact.filter($"k" === 0)
      .withColumn("_salt", pmod(xxhash64(fact.columns.map(col): _*), lit(8)))
      .select(countDistinct($"_salt")).collect().head.getLong(0)
    assert(saltSpread > 1)
  }

  test("graft_dot registers and evaluates via SQL; extensions wiring applies") {
    // getOrCreate reuses the active test session, so exercise the shared
    // builder through the session-registry path...
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect().head.getDouble(0)
    assert(r == 11.0)
    // ...and smoke-test that the SparkSessionExtensions hook wires cleanly
    new graft.functions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
  }
}
