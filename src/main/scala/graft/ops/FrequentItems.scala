package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT heavy hitters at sketch cost: all items whose count exceeds
  * `phi · N`, computed without ever shuffling the full vocabulary.
  *
  * The classic two-pass scheme over [[graft.functions.HeavyHitterSketch]]
  * (Misra–Gries; the second "verify" pass is the textbook way to turn
  * the approximate summary into an exact answer):
  *
  *   1. One aggregation pass computes the MG summary with
  *      k = ⌈1/phi⌉ counters AND the exact row count N. The sketch
  *      guarantee (err ≤ N/(k+1) < phi·N) means every true heavy hitter
  *      is among the ≤ 2k candidate items — under ANY partitioning and
  *      merge order, adversarial input included.
  *   2. A second pass counts ONLY the candidates exactly: the candidate
  *      relation (≤ 2k rows) is broadcast, the groupBy shuffles at most
  *      2k distinct keys — and those keys are by construction the
  *      hottest in the data, which is precisely what HashAggregate's
  *      map-side partial combine flattens.
  *
  * Versus `groupBy(item).count.filter`: same answer, but the shuffle
  * carries O(k · partitions) rows instead of the full vocabulary
  * (10⁷–10⁸ distinct words at 100 TB). Versus a one-pass sketch-only
  * answer: no false positives and exact counts, so the result is
  * engine-independent and oracle-checkable.
  *
  * Output: (item, cnt) for every item with cnt > phi·N, sorted by
  * cnt desc, item asc. Deterministic — the sketch's merge-order
  * nondeterminism affects only which NON-heavy candidates get verified
  * and then filtered out.
  */
object FrequentItems {

  def exactHeavyHitters(items: DataFrame, itemCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    graft.functions.GraftFunctions.register(items.sparkSession)
    val k = math.ceil(1.0 / phi).toInt
    // Re-alias to a private name so a caller column named "item"/"n"
    // can't collide with ours, and build the sketch call with
    // call_function (no string-SQL, so backtick-needing names work).
    val in = items.select(col(itemCol).as("__hh_item"))
    // pass 1: sketch + exact N in ONE aggregation (single scan)
    val summary = in.agg(
      call_function("graft_heavy_hitters", col("__hh_item"), lit(k)).as("hh"),
      count(lit(1)).as("n"))
    val candidates = summary
      .select(col("n").as("__hh_n"), explode(col("hh")).as("h"))
      .select(col("h.item").as("__hh_cand"), col("__hh_n"))
    // pass 2: exact counts for the ≤ 2k candidates only; the candidate
    // set is tiny by construction so the join side is always broadcast
    in
      .join(broadcast(candidates), col("__hh_item") === col("__hh_cand"))
      .groupBy(col("__hh_item"), col("__hh_n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("__hh_n") * lit(phi))
      .select(col("__hh_item").as("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }
}
