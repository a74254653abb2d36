package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot keys (SURVEY.md §7.4 "100 TB-scale
  * design rules": salting + AQE). AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) covers most cases at runtime; these
  * operators are the deterministic plan-level tools for when the skew is
  * known up front (a grouping key where one value holds half the data —
  * the classic web-log hot-key).
  */
object Skew {

  /** Two-phase (salted) aggregation: spread each hot key over `buckets`
    * partial groups, then merge. sum/count/min/max are algebraic so the
    * two-phase result is exact. Phase-1 shuffle keys are (key, salt) —
    * no reducer sees a whole hot key; phase 2 merges `buckets` rows per
    * key. Salt = row-hash of the whole row (deterministic, no RNG). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], buckets: Int,
                aggs: (String, String, String)*): DataFrame = {
    // aggs: (function, inputCol, outAlias) with function in sum|count|min|max
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(buckets)).as("_salt")
    def phase1(f: String, in: String): Column = f match {
      case "count" => count(lit(1))
      case "sum"   => sum(col(in))
      case "min"   => min(col(in))
      case "max"   => max(col(in))
    }
    def phase2(f: String, a: String): Column = f match {
      case "count" | "sum" => sum(col(a))
      case "min"           => min(col(a))
      case "max"           => max(col(a))
    }
    val p1 = df.withColumn("_salt", salt)
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(aggs.head match { case (f, in, out) => phase1(f, in).as(out) },
        aggs.tail.map { case (f, in, out) => phase1(f, in).as(out) }: _*)
    p1.groupBy(keyCols.map(col): _*)
      .agg(aggs.head match { case (f, _, out) => phase2(f, out).as(out) },
        aggs.tail.map { case (f, _, out) => phase2(f, out).as(out) }: _*)
  }

  /** Salted join for a skewed fact against a replicable dimension: the
    * fact side gets a deterministic row-salt, the dimension is exploded
    * `buckets`-fold with every salt value, and the join key becomes
    * (key, salt) — a hot key's rows now land on `buckets` reducers
    * instead of one. Exact same rows as the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets)).cast("int"))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
