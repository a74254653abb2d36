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
        // Halton sampling. FULL oracle since round 13: the radical
        // inverse is a fixed sequence of IEEE-754 double ops, so DuckDB
        // replays it bit-exactly — the iterated-division factor values
        // fₖ = fₖ₋₁/base (which ROUND at each step for base 3) are
        // inlined as round-trip literals from the same Scala loop
        // (Programs.haltonFactorLiterals), the per-digit fold runs in
        // the same ascending order, and the in-circle test uses the
        // identical expression; integer hit counts then hash-match.
        Q("pi_qmc", (s, _) => graft.jobs.Programs.piQmc(s, 1000000L), Some {
          val f2 = graft.jobs.Programs.haltonFactorLiterals(2, 20).mkString(", ")
          val f3 = graft.jobs.Programs.haltonFactorLiterals(3, 13).mkString(", ")
          val p3 = (0 until 13).map(k => math.pow(3, k).toLong).mkString(", ")
          s"""WITH i AS (SELECT unnest(range(1, 1000001)) AS i),
             |h AS (SELECT i,
             |  list_reduce(list_transform(range(1, 21),
             |    k -> CAST((i >> (k - 1)) & 1 AS DOUBLE) * ([$f2])[k]),
             |    (x, y) -> x + y) AS hx,
             |  list_reduce(list_transform(range(1, 14),
             |    k -> CAST((i // ([$p3])[k]) % 3 AS DOUBLE) * ([$f3])[k]),
             |    (x, y) -> x + y) AS hy
             |  FROM i),
             |agg AS (SELECT
             |  CAST(sum(CASE WHEN (hx - 0.5) * (hx - 0.5)
             |      + (hy - 0.5) * (hy - 0.5) <= 0.25
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
             |  CAST(count(*) AS BIGINT) AS n_total FROM h)
             |SELECT n_inside, n_total,
             |  CAST(n_inside AS DOUBLE) * 4.0 / CAST(n_total AS DOUBLE) AS pi_est
             |FROM agg""".stripMargin
        }),
        // Integer-exact certificate twin: quantized Halton grid, pure
        // int64 in-circle test — the DuckDB oracle replays the identical
        // arithmetic over the same index range (Programs.piQmcGrid).
        Q("pi_qmc_grid", (s, _) => graft.jobs.Programs.piQmcGrid(s, 100000L),
          Some("""WITH i AS (SELECT unnest(range(1, 100001)) AS i),
                 |q AS (SELECT i,
                 |  CAST(list_sum(list_transform(range(0, 15),
                 |    k -> ((i >> k) & 1) * (1 << (14 - k)))) AS BIGINT) AS a,
                 |  CAST(list_sum(list_transform(range(0, 9),
                 |    k -> ((i // CAST(power(3, k) AS BIGINT)) % 3)
                 |         * CAST(power(3, 8 - k) AS BIGINT))) AS BIGINT) AS b
                 |  FROM i)
                 |SELECT
                 |  CAST(sum(CASE WHEN
                 |    (2*a - 32768)*(2*a - 32768)*387420489
                 |      + (2*b - 19683)*(2*b - 19683)*1073741824
                 |    <= CAST(1073741824 AS BIGINT)*387420489 THEN 1 ELSE 0 END) AS BIGINT)
                 |    AS n_inside,
                 |  CAST(count(*) AS BIGINT) AS n_total,
                 |  CAST(sum(a) AS BIGINT) AS sum_a,
                 |  CAST(sum(b) AS BIGINT) AS sum_b
                 |FROM q""".stripMargin)))

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
