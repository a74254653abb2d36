package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for the rows-only compression_ratio query: the distributed
  * deflate equals a driver-side deflate byte-for-byte, is invariant
  * under partitioning, and orders repetitive below diverse text — the
  * properties the absent SQL oracle would have certified. */
class CompressionStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def driverDeflate(text: String): Long = {
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(text.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](64 * 1024)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  private val fixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "spam spam spam spam spam spam spam spam spam spam spam spam spam"),
    (3L, "a"),
    (4L, ""),
    (5L, (1 to 200).map(i => s"w$i").mkString(" ")))

  test("distributed deflate counts equal a driver-side deflate exactly") {
    val got = TextStats.compressionStats(fixture.toDF("doc_id", "text"),
        "doc_id", "text")
      .select("id", "n_bytes", "n_deflate")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    fixture.foreach { case (id, text) =>
      assert(got(id) === ((text.getBytes("UTF-8").length.toLong,
        driverDeflate(text))), s"doc $id")
    }
  }

  test("invariant under partitioning (fresh Deflater state per partition)") {
    def run(parts: Int) = TextStats.compressionStats(
        fixture.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(5))
  }

  test("repetitive text compresses below diverse text; empty text is ratio 1") {
    val byId = TextStats.compressionStats(fixture.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(byId(2L) < byId(1L))   // spam run vs prose of similar length
    assert(byId(2L) < byId(5L))   // spam run vs long diverse text
    assert(byId(4L) === 1.0)
  }
}
