package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A registered query: Spark implementation + optional DuckDB oracle SQL.
  * When `oracle` is None the driver records a weaker rows-only check
  * (used for ops whose semantics aren't ANSI-SQL-expressible, e.g. MinHash
  * signatures or pipe subprocess transforms).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Shared helpers for oracle-exact arithmetic.
  *
  * All money-like columns in the test tables carry exactly 2 decimal
  * digits. Summing them as doubles is order-dependent (FP association), so
  * a Spark sum and a DuckDB sum can differ in the last bits and fail the
  * driver's hash compare. Instead both sides convert to integer cents
  * (BIGINT), aggregate exactly, and divide once at the end — bit-identical
  * results regardless of aggregation order or engine.
  */
object Ops {
  /** 2-decimal double → exact integer cents (long). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** SQL-side mirror of [[cents]] for the DuckDB oracle. */
  def sqlCents(col: String): String = s"CAST(round($col*100) AS BIGINT)"
}
