package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SortingSpec extends SparkTestBase {

  test("keyFieldSortColumns: -kN numeric and r reverse flags") {
    import spark.implicits._
    val df = Seq("b\t10", "a\t9", "c\t10").toDF("line")
    // numeric on field 2 desc, then field 1 asc
    val cols = Sorting.keyFieldSortColumns(col("line"), "-k2,2nr -k1,1")
    val got = df.orderBy(cols: _*).as[String].collect().toSeq
    assert(got == Seq("b\t10", "c\t10", "a\t9")) // 10 > 9 numerically, not lexically
  }

  test("totalSort: global order across partitions (SortValidator invariant)") {
    import spark.implicits._
    val n = 10000
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 1000003L).as("k"), col("id"))
    val sorted = Sorting.rangeSorted(df, 8, Seq(col("k"), col("id")))
    // partition-index-major traversal must be globally ordered
    val keys = sorted.select("k").as[Long].collect()
    assert(keys.length == n)
    assert(keys.sliding(2).forall(p => p(0) <= p(1)))
    // record stats preserved (count + checksum), SortValidator:101
    val inSum = df.select(sum(col("k"))).as[Long].head()
    val outSum = sorted.select(sum(col("k"))).as[Long].head()
    assert(inSum == outSum)
  }

  test("secondarySorted: values sorted within natural-key groups per partition") {
    import spark.implicits._
    val df = Seq((1, 3), (1, 1), (2, 5), (1, 2), (2, 4)).toDF("k1", "k2")
    val out = Sorting.secondarySorted(df, 2, Seq(col("k1")), Seq(col("k2")))
    val perPartition = out.rdd.mapPartitions(it => Iterator(it.map(r =>
      (r.getInt(0), r.getInt(1))).toList)).collect()
    // within each partition, rows grouped by k1 and ascending by k2
    perPartition.foreach { rows =>
      rows.groupBy(_._1).foreach { case (_, g) =>
        assert(g.map(_._2) == g.map(_._2).sorted)
      }
    }
    // all rows of one natural key land in one partition (FirstPartitioner)
    val keyToParts = perPartition.zipWithIndex.flatMap { case (rows, pi) =>
      rows.map(r => (r._1, pi))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(keyToParts.values.forall(_ == 1))
  }

  test("topK matches sort-then-take") {
    import spark.implicits._
    val df = spark.range(5000).select((col("id") * 48271L % 99991L).as("v"))
    val got = Sorting.topK(df, 10, Seq(col("v").desc)).as[Long].collect().toSeq
    val want = df.as[Long].collect().sorted(Ordering[Long].reverse).take(10).toSeq
    assert(got == want)
  }

  test("key-field spec with char offsets within a field (-k1.2,1.3n)") {
    import spark.implicits._
    // field 1 = "xNNy": sort numerically by chars 2..3
    val df = Seq("a42z\tfoo", "b07z\tbar", "c99z\tbaz", "d10z\tqux").toDF("line")
    val cols = Sorting.keyFieldSortColumns(col("line"), "-k1.2,1.3n")
    val got = df.orderBy(cols: _*).select("line").as[String].collect()
      .map(_.takeWhile(_ != '\t')).toSeq
    assert(got == Seq("b07z", "d10z", "a42z", "c99z"))
  }

  test("key-field spec open char offset (-k2.4r)") {
    import spark.implicits._
    val df = Seq("x\tab-ccc", "y\tzz-aaa", "w\tmm-bbb").toDF("line")
    val cols = Sorting.keyFieldSortColumns(col("line"), "-k2.4r")
    val got = df.orderBy(cols: _*).select("line").as[String].collect().toSeq
    // sorts by the suffix from char 4 of field 2 (ccc, bbb, aaa), reversed
    assert(got == Seq("x\tab-ccc", "w\tmm-bbb", "y\tzz-aaa"))
  }
}
