package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.Outputs

/** Canonical programs + sink surface. */
class ProgramsSpec extends SparkTestBase {

  test("pi via deterministic Halton QMC converges") {
    val row = Programs.piQmc(spark, 200000L).collect().head
    val pi = row.getDouble(2)
    assert(math.abs(pi - math.Pi) < 0.01, s"pi_est=$pi")
    assert(row.getLong(1) == 200000L)
    // deterministic: same inputs, same estimate
    assert(Programs.piQmc(spark, 200000L).collect().head.getDouble(2) == pi)
  }

  test("quantized-Halton pi certificate matches its cross-engine integer constants") {
    // the same values DuckDB's oracle SQL computes for N=100000 — all
    // arithmetic is int64, so these are engine-independent constants
    // (the twin that driver-certifies the distributed Halton indexing)
    val r = Programs.piQmcGrid(spark, 100000L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((78530L, 100000L, 1638305968L, 984065472L)), r.toString)
    // and the quantized estimate still approximates pi
    assert(math.abs(4.0 * r.getLong(0) / r.getLong(1) - math.Pi) < 0.01)
  }

  test("distcp-lite copies a tree and -update skips up-to-date files") {
    val src = Files.createTempDirectory("dcp_src")
    Files.createDirectories(src.resolve("sub"))
    Files.writeString(src.resolve("a.txt"), "alpha")
    Files.writeString(src.resolve("sub/b.txt"), "bravo")
    val dst = Files.createTempDirectory("dcp_dst").resolve("out")

    val (c1, s1) = Programs.distCpLite(spark, src.toString, dst.toString)
    assert(c1 == 2 && s1 == 0)
    assert(Files.readString(dst.resolve("a.txt")) == "alpha")
    assert(Files.readString(dst.resolve("sub/b.txt")) == "bravo")

    Files.writeString(src.resolve("c.txt"), "charlie") // new file
    val (c2, s2) = Programs.distCpLite(spark, src.toString, dst.toString, update = true)
    assert(c2 == 1 && s2 == 2)
    assert(Files.readString(dst.resolve("c.txt")) == "charlie")
  }

  test("chain composition fuses stages without an exchange") {
    import spark.implicits._
    val base = Seq((1, "a b"), (2, "c d")).toDF("id", "s")
    val out = Programs.chain(base,
      _.withColumn("w", explode(split(col("s"), " "))),
      _.filter(col("w") =!= "a"),
      _.select(col("id"), upper(col("w")).as("w")))
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "B"), (2, "C"), (2, "D")))
    // chained narrow stages must stay in one stage: no shuffle exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("text KV output roundtrip with configurable separator") {
    import spark.implicits._
    val path = Files.createTempDirectory("tkv").resolve("out").toString
    val df = Seq(("k1", 10L), ("k2", 20L)).toDF("key", "value")
    Outputs.writeTextKV(df, path, sep = "\t")
    val back = Outputs.readTextKV(spark, path)
      .collect().map(r => (r.getString(0), r.getString(1).toLong)).toSet
    assert(back == Set(("k1", 10L), ("k2", 20L)))
  }

  test("multiple outputs: per-value directories via partitionBy") {
    import spark.implicits._
    val path = Files.createTempDirectory("mout").resolve("out").toString
    val df = Seq((1L, "en"), (2L, "fr"), (3L, "en")).toDF("id", "lang")
    Outputs.writeMultipleOutputs(df, path, "lang")
    val en = spark.read.parquet(s"$path/lang=en")
    assert(en.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val back = spark.read.parquet(path)
    assert(back.count() == 3)
  }

  test("rebalanced write produces right-sized files and preserves data") {
    import spark.implicits._
    val path = Files.createTempDirectory("rebal").resolve("out").toString
    // 64 skewed input partitions of tiny data would write 64 tiny files;
    // the rebalance hint coalesces to a handful
    val df = spark.range(0, 10000, 1, 64).select($"id", ($"id" % 5).as("k"))
    Outputs.writeRebalanced(df, path)
    val back = spark.read.parquet(path)
    assert(back.count() == 10000)
    val nFiles = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles < 64, s"still $nFiles files")
  }

  test("ProgramDriver registry runs programs by name") {
    val res = ProgramDriver.programs("pi")(spark, Seq("10000"))
    assert(res.asInstanceOf[Array[org.apache.spark.sql.Row]].length == 1)
  }
}
