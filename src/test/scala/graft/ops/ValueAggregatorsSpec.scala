package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ValueAggregatorsSpec extends SparkTestBase {

  test("descriptor registry compiles the reference names") {
    import spark.implicits._
    val df = Seq(("k", 3L, "b"), ("k", 1L, "a"), ("k", 3L, "c")).toDF("k", "v", "s")
    val got = df.groupBy(col("k")).agg(
      ValueAggregators.compile("LongValueSum", col("v")).as("sum"),
      ValueAggregators.compile("LongValueMax", col("v")).as("max"),
      ValueAggregators.compile("LongValueMin", col("v")).as("min"),
      ValueAggregators.compile("StringValueMax", col("s")).as("smax"),
      ValueAggregators.compile("StringValueMin", col("s")).as("smin"),
      ValueAggregators.compile("UniqValueCount", col("v")).as("uniq"))
      .head()
    assert(got.getLong(1) == 7L && got.getLong(2) == 3L && got.getLong(3) == 1L)
    assert(got.getString(4) == "c" && got.getString(5) == "a")
    assert(got.getLong(6) == 2L)
    assertThrows[IllegalArgumentException](
      ValueAggregators.compile("NoSuch", col("v")))
  }

  test("UniqValueCount cap (UniqValueCount.java:74-78)") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("k", i.toString)).toDF("k", "v")
    val got = df.groupBy(col("k"))
      .agg(ValueAggregators.compile("UniqValueCount", col("v"), cap = 7))
      .head().getLong(1)
    assert(got == 7L)
  }

  test("UniqValueCountAgg typed Aggregator caps buffer size") {
    import spark.implicits._
    val agg = new ValueAggregators.UniqValueCountAgg(5)
    val ds = (1 to 100).map(_.toString).toDS()
    val got = ds.select(agg.toColumn).head()
    assert(got == 5L)
    // merge respects the cap too
    val merged = agg.merge(Set("1", "2", "3"), Set("4", "5", "6", "7"))
    assert(merged.size == 5)
  }

  test("valueHistogram matches a brute-force computation") {
    import spark.implicits._
    val data = Seq(
      ("t1", "u1"), ("t1", "u1"), ("t1", "u1"), ("t1", "u2"),
      ("t2", "u1"), ("t2", "u2"), ("t2", "u3"))
    val df = data.toDF("k", "v")
    val got = ValueAggregators.valueHistogram(df, "k", "v")
      .orderBy("k").collect()
    // t1: freqs = [3,1] → n=2 min=1 med=2.0 max=3 avg=2.0 sd=sqrt(2)
    val t1 = got(0)
    assert(t1.getLong(1) == 2 && t1.getLong(2) == 1 && t1.getLong(4) == 3)
    assert(math.abs(t1.getDouble(3) - 2.0) < 1e-12)
    assert(math.abs(t1.getDouble(5) - 2.0) < 1e-12)
    assert(math.abs(t1.getDouble(6) - math.sqrt(2.0)) < 1e-12)
    // t2: freqs = [1,1,1] → stddev 0
    val t2 = got(1)
    assert(t2.getLong(1) == 3 && t2.getDouble(6) == 0.0)
  }
}
