package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** DataSource V2 fixed-width source: correctness + genuine splittability
  * (multiple record-aligned partitions from ONE file — the property the
  * binaryFile-based reader cannot provide at 100 TB). */
class FixedWidthV2Spec extends SparkTestBase {

  private val fmt = "graft.sources.v2.FixedWidthDataSource"

  test("reads records with correct offsets and splits one file into many partitions") {
    val dir = Files.createTempDirectory("fwv2")
    val f = dir.resolve("data.bin")
    val n = 1000
    val recs = (0 until n).map(i => (f"k$i%09d" + "v" * 90).getBytes("UTF-8"))
    Files.write(f, recs.flatten.toArray)

    val df = spark.read.format(fmt)
      .option("recordLen", "100")
      .option("maxSplitBytes", 10000) // 100 records per split -> 10 splits
      .load(f.toString)

    assert(df.rdd.getNumPartitions == 10) // splittable: 10 ranges of one file
    assert(df.count() == n)
    val rows = df.orderBy(col("offset")).collect()
    assert(rows.map(_.getLong(1)).toSeq == (0 until n).map(_ * 100L))
    assert(new String(rows(123).getAs[Array[Byte]]("record")).startsWith("k000000123"))
    // ragged tail is ignored (FixedLengthRecordReader contract)
    Files.write(f, (recs.flatten.toArray ++ "tail".getBytes))
    assert(spark.read.format(fmt).option("recordLen", "100")
      .load(f.toString).count() == n)
  }

  test("fixed-width writer roundtrip: gen -> sort -> write -> V2 read -> validate") {
    val out = Files.createTempDirectory("fwv2w").resolve("tera").toString
    val gen = graft.jobs.TeraSuite.teraGen(spark, rows = 5000, partitions = 4)
    val (nIn, crcIn) = graft.jobs.TeraSuite.checksum(gen)
    val sorted = graft.jobs.TeraSuite.teraSort(gen, partitions = 4)
    graft.sources.v2.FixedWidthWriter.write(sorted, out, recordLen = 100)
    val back = spark.read.format(fmt)
      .option("recordLen", "100").option("maxSplitBytes", 50000)
      .load(out)
      .select(substring(col("record"), 1, 10).as("key"),
        substring(col("record"), 11, 90).as("value"))
    val (nOut, crcOut) = (back.count(),
      back.agg(sum(crc32(concat(col("key"), col("value"))))).collect().head.getLong(0))
    assert(nOut == nIn && crcOut == crcIn)
    // part files are themselves sorted and concatenable in index order
    val (vn, _) = graft.jobs.TeraSuite.teraValidate(
      graft.jobs.TeraSuite.teraSort(back, partitions = 4))
    assert(vn == nIn)
  }

  test("terasort runs over the V2 source: split scan -> range sort -> validate") {
    val dir = Files.createTempDirectory("fwv2tera")
    val f = dir.resolve("tera.bin")
    // deterministic shuffled keys so the sort is non-trivial
    val recs = (0 until 2000).map { i =>
      val k = f"${(i * 48271) % 99991}%010d"
      (k + "x" * 90).getBytes("UTF-8")
    }
    Files.write(f, recs.flatten.toArray)
    val df = spark.read.format(fmt)
      .option("recordLen", "100").option("maxSplitBytes", 20000)
      .load(f.toString)
      .select(substring(col("record"), 1, 10).as("key"),
        substring(col("record"), 11, 90).as("value"))
    val sorted = graft.jobs.TeraSuite.teraSort(df, partitions = 8)
    val (cnt, _) = graft.jobs.TeraSuite.teraValidate(sorted)
    assert(cnt == 2000)
  }
}
