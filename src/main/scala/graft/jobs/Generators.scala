package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RandomWriter / RandomTextWriter analogs (reference:
  * `EX/RandomWriter.java:297` — random-size binary KV records;
  * `EX/RandomTextWriter.java` — keys/values as random word sequences).
  * The standard load/skew generators for exercising sort and shuffle.
  *
  * Unlike the reference's mutable `Random` per mapper, every record is a
  * PURE FUNCTION of (seed, row index) via a splitmix64 mix — so the
  * dataset is reproducible under retries, re-partitioning, and
  * speculative execution (the property TeraGen's skip-ahead PRNG buys;
  * here it is free). All sizing runs inside whole-stage codegen —
  * `spark.range` + expressions, no RDD, no driver data. */
object Generators {

  private def mix(c: org.apache.spark.sql.Column) = xxhash64(c)

  /** Binary KV records: key 10–1000 bytes, value 0–20000 bytes (the
    * reference's default ranges), sizes and content derived from the row
    * index. `bytesTarget` is approximate (mean record ≈ 10.5 KB). */
  def randomWriter(spark: SparkSession, bytesTarget: Long, seed: Long = 1L,
                   partitions: Int = 32): DataFrame = {
    val meanRecord = (10 + 1000) / 2 + (0 + 20000) / 2
    val rows = math.max(bytesTarget / meanRecord, 1L)
    val base = spark.range(0, rows, 1, partitions)
      .withColumn("h", mix(concat_ws(":", lit(seed), col("id"))))
    base.select(
      col("id"),
      // repeat an md5 hex block and unhex the first 2*len chars: full-
      // range bytes without ever casting binary through a string charset
      expr("unhex(substring(repeat(md5(concat('k', h)), 63), 1, " +
        "2 * (10 + pmod(h, 991))))").as("key"),
      expr("unhex(substring(repeat(md5(concat('v', h)), 1251), 1, " +
        "2 * pmod(h, 20001)))").as("value"))
  }

  /** The reference embeds a 1000-word list; generating the lexicon
    * (deterministic pseudo-words, 3–12 chars) keeps the same statistics
    * without copying data out of the reference tree. */
  val lexicon: IndexedSeq[String] = {
    def mixL(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until 1000).map { i =>
      val h = mixL(i.toLong)
      val n = 3 + (math.abs(h) % 10).toInt
      (0 until n).map(j => ('a' + math.abs(mixL(h + j)) % 26).toChar).mkString
    }
  }

  /** Text KV records: key = 5–10 words, value = 20–100 words sampled
    * from [[lexicon]] by index-derived hashes (RandomTextWriter's
    * shape: sentence-like values for wordcount/sort demos). */
  def randomTextWriter(spark: SparkSession, rows: Long, seed: Long = 1L,
                       partitions: Int = 32): DataFrame = {
    val lex = array(lexicon.map(lit): _*)
    val base = spark.range(0, rows, 1, partitions)
      .withColumn("h", mix(concat_ws(":", lit(seed), col("id"))))
      .withColumn("lex", lex)
    def words(tag: String, minW: Int, maxW: Int) = {
      val span = maxW - minW + 1
      // n words, the j-th picked by hash(tag, h, j)
      array_join(
        transform(
          sequence(lit(1), lit(minW) + pmod(mix(concat_ws(":", lit(tag), col("h"))), lit(span)).cast("int")),
          j => element_at(col("lex"),
            (pmod(mix(concat_ws(":", lit(tag), col("h"), j)), lit(1000)) + 1).cast("int"))),
        " ")
    }
    base.select(col("id"),
      words("k", 5, 10).as("key"),
      words("v", 20, 100).as("value"))
  }
}
