package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.{GroupSort, Safe}
import graft.sources.{SequenceFiles, XmlRecords}

class TeraAndOpsSpec extends SparkTestBase {

  test("teragen -> terasort -> teravalidate: global order + checksum equality") {
    val gen = TeraSuite.teraGen(spark, rows = 20000, partitions = 8)
    val (nIn, crcIn) = TeraSuite.checksum(gen)
    val sorted = TeraSuite.teraSort(gen, partitions = 8)
    val (nOut, crcOut) = TeraSuite.teraValidate(sorted)
    assert(nIn == 20000 && nOut == nIn)
    assert(crcIn == crcOut) // nothing lost, nothing duplicated
    // negative control: an unsorted frame must fail validation
    intercept[IllegalArgumentException] {
      TeraSuite.teraValidate(gen.repartition(8))
    }
  }

  test("sorted-groups: values arrive secondary-sorted per natural key") {
    import spark.implicits._
    val rows = Seq((1L, 30, "c"), (1L, 10, "a"), (1L, 20, "b"),
                   (2L, 5, "x"), (2L, 1, "y")).toDF("k", "seq", "v")
      .as[(Long, Int, String)]
    val out = GroupSort.sortedGroups(rows)(_._1)(col("seq")) { (k, it) =>
      Iterator.single((k, it.map(_._3).mkString("")))
    }.collect().toMap
    assert(out == Map(1L -> "abc", 2L -> "yx"))
  }

  test("bucketed co-partitioned join runs without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
    // fresh in-memory catalog can't drop a previous JVM's table files
    for (t <- Seq("bk_a", "bk_b"))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft-warehouse/$t"))
    (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_a")
    (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_b")
    val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    // pre-bucketed co-partitioned inputs = CompositeInputFormat map-side
    // join (SURVEY.md §2.4): SortMergeJoin with NO ShuffleExchange
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == 1000)
  }

  test("bucketed point lookup prunes to one bucket (MapFile getEntry analog)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS mapfile_t")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-warehouse/mapfile_t"))
    (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("mapfile_t")
    // point lookups don't trigger auto-bucketed scan; force it like a
    // lookup-serving session would
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val lookup = spark.table("mapfile_t").filter($"k" === 4242L)
      val plan = lookup.queryExecution.executedPlan.toString
      // MapFile.Reader.seek ≙ bucket pruning: only 1 of 8 buckets scanned
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
      assert(lookup.collect().map(_.getString(1)).toSeq == Seq("v4242"))
    } finally spark.conf.set(key, prev)
  }

  test("mapfile_lookup registry query: the point lookup opens ONE of 16 buckets") {
    val df = graft.SparkEntry.queries("mapfile_lookup")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 16"), plan)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("XML-delimited records reader extracts tag bodies") {
    val dir = Files.createTempDirectory("xml")
    Files.writeString(dir.resolve("a.xml"),
      "<doc id='1'>hello world</doc>\n<doc>second body</doc>\n<doc>third</doc>")
    val recs = XmlRecords.read(spark, dir.toString, "doc")
      .collect().map(_.getString(0)).toSet
    assert(recs == Set("hello world", "second body", "third"))
  }

  test("auto-input sniffs SequenceFile vs text") {
    import spark.implicits._
    val seqPath = Files.createTempDirectory("auto").resolve("seq").toString
    SequenceFiles.writeTextLong(Seq(("k", 7L)).toDF("key", "value"), seqPath)
    val bySeq = SequenceFiles.autoRead(spark, seqPath).collect()
    assert(bySeq.map(r => (r.getString(0), r.getString(1))).toSet == Set(("k", "7")))

    val txtDir = Files.createTempDirectory("auto2")
    Files.writeString(txtDir.resolve("f.txt"), "line1\nline2")
    val byText = SequenceFiles.autoRead(spark, txtDir.toString).collect()
    assert(byText.map(_.getString(1)).toSet == Set("line1", "line2"))
  }

  test("bad-record skipping: poison rows become null + counted, good rows survive") {
    import spark.implicits._
    val skipped = spark.sparkContext.longAccumulator("skipped")
    val parse = Safe.tryUdf((s: String) => s.toInt, skipped)
    val df = Seq("1", "2", "oops", "4", "bad").toDF("s")
      .select(parse(col("s")).as("n"))
    val good = df.filter(col("n").isNotNull).collect().map(_.getInt(0)).toSet
    assert(good == Set(1, 2, 4))
    assert(skipped.value == 2)
  }
}
