package graft.tools

/** Plan inspection: `runMain graft.tools.Explain <sfDir> <query...>`
  * prints the formatted physical plan of each named registry query —
  * the feedback loop for pushdown/broadcast/codegen review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    try names.foreach { n =>
      println(s"===== $n")
      try println(graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: $e") }
    } finally spark.stop()
  }
}
