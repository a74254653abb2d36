package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

class MiscSpec extends SparkTestBase {

  test("approx_stats sketches land within tolerance of exact answers") {
    val approx = graft.SparkEntry.queries("approx_stats")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (aUsers, aMed)) <- approx) {
      val (eUsers, eMed) = exact(k)
      assert(math.abs(aUsers - eUsers).toDouble / eUsers < 0.1,
        s"$k: HLL $aUsers vs exact $eUsers")
      // t-digest with accuracy 1000 on ~2k rows: generous 20% band
      assert(math.abs(aMed - eMed) / math.max(math.abs(eMed), 1e-9) < 0.2,
        s"$k: approx median $aMed vs exact $eMed")
    }
  }
}
