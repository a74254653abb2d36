package graft.tools

/** Dev tool: print the formatted physical plan of a registry query at
  * sf0.001 — `runMain graft.tools.PlanPeek <query_name>`. The fast way to
  * check pushdown/exchange placement while iterating on a plan shape. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args.head)(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
