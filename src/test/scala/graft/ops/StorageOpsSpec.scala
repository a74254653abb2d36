package graft.ops

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.SparkTestBase
import graft.core.Tables

/** Compaction + dynamic partition overwrite + format roundtrips: the
  * storage-lifecycle invariants the oracle can't see from the returned
  * rows alone — file counts, untouched-partition stability, sentinel
  * null handling.
  */
class StorageOpsSpec extends SparkTestBase {

  private def ls(dir: String): Map[String, Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val it = fs.listFiles(p, true)
      val b = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_"))
          b += (f.getPath.toString -> f.getModificationTime)
      }
      b.toMap
    }
  }

  test("compaction collapses a 64-file directory and preserves content") {
    val dir = "/tmp/graft-test/compact_customer"
    val src = Tables.customer(spark, sf0001)
    src.repartition(64).write.mode("overwrite").parquet(dir)
    val before = Compaction.stats(spark, dir)
    assert(before._1 >= 32, s"expected many small files, got ${before._1}")
    val st = Compaction.compactParquet(spark, dir, targetBytes = 256L * 1024 * 1024)
    assert(st.filesBefore == before._1)
    assert(st.filesAfter < st.filesBefore / 8,
      s"compaction barely helped: ${st.filesBefore} -> ${st.filesAfter}")
    // content is bit-identical
    val a = src.orderBy("c_custkey").collect()
    val b = spark.read.parquet(dir).orderBy("c_custkey").collect()
    assert(a.sameElements(b))
  }

  test("dynamic partition overwrite rewrites only the delta's partitions") {
    val dir = "/tmp/graft-test/orders_by_status"
    val o = Tables.orders(spark, sf0001)
    PartitionedWrite.writePartitioned(o, dir, Seq("o_orderstatus"))
    val untouchedBefore = ls(dir).filter(!_._1.contains("o_orderstatus=O"))
    assert(untouchedBefore.nonEmpty)
    Thread.sleep(5) // let mtimes tick so a rewrite would be visible
    val delta = o.filter(col("o_orderstatus") === "O")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    PartitionedWrite.overwritePartitions(delta, dir, Seq("o_orderstatus"))
    val untouchedAfter = ls(dir).filter(!_._1.contains("o_orderstatus=O"))
    assert(untouchedAfter == untouchedBefore,
      "non-target partitions were rewritten by a dynamic overwrite")
    // target partition carries the doubled prices; others the originals
    val back = spark.read.parquet(dir)
    val nO = back.filter(col("o_orderstatus") === "O").count()
    assert(nO == o.filter(col("o_orderstatus") === "O").count())
    val diff = back.filter(col("o_orderstatus") =!= "O")
      .select("o_orderkey", "o_totalprice")
      .except(o.filter(col("o_orderstatus") =!= "O")
        .select("o_orderkey", "o_totalprice"))
    assert(diff.isEmpty, "untouched partitions changed content")
  }

  test("csv roundtrip keeps null and empty string distinct") {
    import spark.implicits._
    val df = Seq((1L, Some("a,b\"c"), "x"), (2L, None, ""), (3L, Some(""), "z"))
      .toDF("id", "s1", "s2")
    val back = graft.sources.Formats
      .roundtrip(df, "csv", "/tmp/graft-test/fmt_null_csv")
      .orderBy("id").collect()
    assert(back(1).isNullAt(1) && back(1).getString(2) == "")
    assert(back(2).getString(1) == "" && back(0).getString(1) == "a,b\"c")
  }

  test("json roundtrip is exact on control chars and unicode text") {
    import spark.implicits._
    val df = Seq((1L, "line\nbreak\ttab \"quote\" \\slash"),
      (2L, "ünïcödé ✓ 中文"), (3L, "")).toDF("id", "text")
    val back = graft.sources.Formats
      .roundtrip(df, "json", "/tmp/graft-test/fmt_json")
      .orderBy("id").collect().map(_.getString(1))
    assert(back.sameElements(Array("line\nbreak\ttab \"quote\" \\slash",
      "ünïcödé ✓ 中文", "")))
  }
}
