package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[Q]] in
  * [[registry]]: a Spark DataFrame implementation plus (where the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {
  def registry: Seq[Q] =
    CoreQueries.all ++ JoinQueries.all ++ OpsQueries.all ++ LlmQueries.all ++
      AnalyticsQueries.all ++ MiscQueries.all ++ PipelineQueries.all ++
      TpchQueries.all ++ TpchQueries2.all ++ FormatQueries.all ++ Seq(
        // QuasiMonteCarlo pi (EX/QuasiMonteCarlo.java): deterministic
        // Halton sampling; accuracy asserted in ProgramsSpec (rows-only).
        Q("pi_qmc", (s, _) => graft.jobs.Programs.piQmc(s, 1000000L), None))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_inner")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
