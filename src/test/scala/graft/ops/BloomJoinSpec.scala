package graft.ops

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Pins for runtime bloom semi-join pruning: exactness (pruned ≡
  * unpruned — no false negatives survive to change the result), actual
  * shuffle-volume reduction, and the plan shape (the `might_contain`
  * probe sits in the fact side's scan stage, not above the join).
  */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def dim = Tables.supplier(spark, sf0001)
    .filter(col("s_nationkey") === 3).select(col("s_suppkey"), col("s_name"))

  test("pruned join result is bit-identical to the plain join") {
    val fact = Tables.lineitem(spark, sf0001)
    val pruned = BloomJoin.prunedEquiJoin(fact, dim, "l_suppkey", "s_suppkey",
        ndv = 1000L, numBits = 1L << 16)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    assert(pruned.collect().toSet === plain.collect().toSet)
    assert(pruned.count() > 0)
  }

  test("probe actually prunes: non-matching fact rows rejected before the join") {
    val fact = Tables.lineitem(spark, sf0001)
    val bytes = BloomJoin.buildFilter(dim, col("s_suppkey"), ndv = 1000L,
      numBits = 1L << 16)
    val kept = BloomJoin.probe(fact, col("l_suppkey"), bytes).count()
    val total = fact.count()
    val trueMatches = fact.join(dim.hint("broadcast"),
      col("l_suppkey") === col("s_suppkey"), "left_semi").count()
    // no false negatives: everything that joins survives the probe
    assert(kept >= trueMatches)
    // real pruning: with ~10 of 10 suppliers in other nations, the probe
    // must reject the bulk of the fact side (fpp at 64 Ki bits over ≤10
    // keys is negligible)
    assert(kept < total / 2,
      s"probe kept $kept of $total rows — bloom not pruning")
  }

  test("an empty dim side prunes everything") {
    val fact = Tables.lineitem(spark, sf0001)
    val none = dim.filter(lit(false))
    val bytes = BloomJoin.buildFilter(none, col("s_suppkey"), ndv = 10L,
      numBits = 1L << 12)
    assert(BloomJoin.probe(fact, col("l_suppkey"), bytes).count() === 0L)
  }

  test("plan pin: might_contain filters the fact scan stage below the join") {
    val fact = Tables.lineitem(spark, sf0001)
    val joined = BloomJoin.prunedEquiJoin(fact, dim, "l_suppkey", "s_suppkey",
      ndv = 1000L, numBits = 1L << 16)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe missing from physical plan:\n$plan")
    // the probe must be on the scan side of the exchange: find the Filter
    // carrying might_contain and check a parquet scan (not a join) is its
    // descendant within the same stage text block
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "probe filter should appear under (after, in tree print order) the join node")
  }
}
