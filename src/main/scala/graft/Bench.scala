package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registry query against
  * SPARK_GRAFT_SF_DIR, executed to a noop sink (count() would let
  * Catalyst prune sorts/projections and flatter the numbers; the noop
  * write forces full execution of the physical plan). One JSON line on
  * stdout for the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.withDefaults(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up outside the timed region — otherwise the first
    // query (alphabetical) absorbs several seconds of classloading
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of two runs: the shared bench machine adds ±30% noise, and
      // the minimum is the honest capability number
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
