package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the properties the group_split oracle can't express: every group
  * lands in exactly one split (the leakage guarantee), assignment is
  * stable across runs and repartitionings, fences behave as documented,
  * and malformed fence lists fail fast. */
class GroupSplitSpec extends SparkTestBase {
  import spark.implicits._

  private val cuts = Seq(("train", "8000"), ("valid", "c000"),
    ("test", Sampling.fullRateHex))

  private def fixture = (1L to 500L).flatMap(g =>
    (0 until 3).map(i => (g, s"row-$g-$i"))).toDF("grp", "payload")

  test("every group lands in exactly one split; rows of a group travel together") {
    val out = Sampling.groupSplit(fixture, "grp", cuts)
    val perGroup = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("nsplits"))
    assert(perGroup.filter(col("nsplits") =!= 1).count() == 0)
    // all three splits are populated at these fences and group count
    assert(out.select("split").distinct().as[String].collect().sorted.toSeq
      == Seq("test", "train", "valid"))
  }

  test("assignment is a pure function: identical across runs and partitionings") {
    def assigned(parts: Int) = Sampling.groupSplit(
        fixture.repartition(parts), "grp", cuts)
      .select("grp", "split").distinct()
      .as[(Long, String)].collect().toMap
    val a = assigned(1)
    assert(assigned(7) === a)
    assert(assigned(32) === a)
  }

  test("fences are half-open upper bounds; fullRateHex catches every key including 'ffff'") {
    // one-split pass-through: everything assigned, nothing dropped
    val all = Sampling.groupSplit(fixture, "grp",
      Seq(("only", Sampling.fullRateHex)))
    assert(all.count() == fixture.count())
    assert(all.filter(col("split") =!= "only").count() == 0)
  }

  test("malformed fence lists fail fast") {
    intercept[IllegalArgumentException](
      Sampling.groupSplit(fixture, "grp", Seq.empty))
    intercept[IllegalArgumentException](       // last fence not fullRateHex
      Sampling.groupSplit(fixture, "grp", Seq(("a", "8000"))))
    intercept[IllegalArgumentException](       // fences not increasing
      Sampling.groupSplit(fixture, "grp",
        Seq(("a", "c000"), ("b", "8000"), ("c", Sampling.fullRateHex))))
  }
}
