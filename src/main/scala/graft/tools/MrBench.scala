package graft.tools

import org.apache.spark.sql.functions._

/** MRBench analog (`JCT/mapred/MRBench.java:41`, `runJobInSequence :173`):
  * repeated tiny-job latency. The reference measured full MR job spin-up
  * (JVM launch + scheduling, seconds per job); here a "job" is a
  * DataFrame action — the number is scheduler+codegen overhead, the
  * fixed cost every real query pays on top of data time.
  *
  * `runMain graft.tools.MrBench [numRuns]` → one JSON line.
  */
object MrBench {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(20)
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // warm-up
      spark.range(1000).agg(sum(col("id"))).collect()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        spark.range(10000)
          .select(col("id"), (col("id") % 7).as("k"))
          .groupBy(col("k")).agg(sum(col("id")))
          .collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val avg = times.sum / times.size
      println(f"""{"metric":"small_job_latency_ms","avg":$avg%.1f,""" +
        f""""p50":${times(times.size / 2)}%.1f,"min":${times.head}%.1f,""" +
        f""""max":${times.last}%.1f,"runs":$runs}""")
    } finally spark.stop()
  }
}
