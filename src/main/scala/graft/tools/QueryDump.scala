package graft.tools

/** One-query iteration loop for oracle work: run a single registry query
  * against an sf dir, write its result parquet, and dump its oracle SQL
  * (if any) next to it — the minimal slice of Verify for developing a
  * new oracle without paying the full 200-query pass.
  *
  * Usage: `runMain graft.tools.QueryDump <name> [sfDir] [outDir]`
  * → `<outDir>/<name>.parquet`, `<outDir>/<name>.oracle.sql`.
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryDump <query> [sfDir] [outDir]")
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(2).getOrElse("/tmp/querydump")
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    println(s"QUERYDUMP rows=${spark.read.parquet(s"$outDir/$name.parquet").count()}")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      val p = new java.io.PrintWriter(s"$outDir/$name.oracle.sql")
      try p.write(sql) finally p.close()
      println(s"QUERYDUMP oracle=$outDir/$name.oracle.sql")
    }
    spark.stop()
  }
}
