package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the pre-training gate every 100 TB
  * corpus/warehouse load runs before anything downstream trusts the
  * data. The reference's counter mechanism (`CORE/mapred/Counters.java`,
  * incremented per record inside user map code) is the same capability
  * expressed imperatively; here each check is a Column predicate and the
  * engine keeps the single-scan property for the whole rule set rather
  * than per-job counters.
  *
  * Three check shapes, each with the cheapest plan its semantics allow:
  *
  *  - ROW RULES (nullness, ranges, regexp, cross-column invariants):
  *    ALL rules evaluate in ONE scan — one aggregate row of
  *    `sum(violation)` columns, unpivoted to (rule, n_violations). At
  *    100 TB the difference between one pass and one-pass-per-rule is
  *    the whole audit budget; adding a rule adds one codegen'd counter,
  *    not a scan.
  *  - UNIQUENESS (key sets): needs the distinct relation — one
  *    partial-agged groupBy, violations = rows in excess of their key's
  *    first (Σ (cnt − 1) over duplicated keys).
  *  - REFERENTIAL INTEGRITY (child key ⊆ parent key set): a left-anti
  *    join against the parent's distinct keys — broadcast when the
  *    parent is dimension-sized, shuffle otherwise; Catalyst's choice,
  *    not ours.
  *
  * Everything is exact long counting — no sampling, no sketches — so
  * audits are oracle-checkable and reproducible run-to-run. NULL
  * predicate results count as violations (a rule that cannot evaluate
  * has not passed), pinned in DataAuditSpec.
  */
object DataAudit {

  /** All row rules in one scan. Output: (rule, n_violations, n_rows),
    * one row per rule, input order preserved via the rule name. */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    // violation = NOT coalesce(pass, false): a NULL verdict is a failure.
    // Counters are aliased positionally so rule names never need quoting
    // inside the stack() expression.
    val counters = rules.zipWithIndex.map { case ((_, pass), i) =>
      sum(when(coalesce(pass, lit(false)), 0L).otherwise(1L)).as(s"c$i")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(counters.head, counters.tail: _*)
    val stacked = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', c$i"
    }.mkString(", ")
    one.select(
      expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)"),
      col("__n").as("n_rows"))
  }

  /** Duplicate-key count: Σ (cnt − 1) over keys appearing more than
    * once — 0 iff the key set is unique. Output: one row
    * (rule, n_violations, n_rows). */
  def uniqueCheck(df: DataFrame, ruleName: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("n_violations"),
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
      .select(lit(ruleName).as("rule"), col("n_violations"), col("n_rows"))

  /** Orphaned-child count: child rows whose key has no parent. NULL
    * child keys are orphans (they reference nothing). Output: one row
    * (rule, n_violations, n_rows). */
  def fkCheck(child: DataFrame, childKey: String, ruleName: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    val n = child.count()
    val orphans = child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .count()
    child.sparkSession.range(1).select(
      lit(ruleName).as("rule"), lit(orphans).as("n_violations"),
      lit(n).as("n_rows"))
  }
}
