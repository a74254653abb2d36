package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter semi-join pruning — the "sideways information
  * passing" half of the reference's map-side join story
  * (`lib/join/CompositeInputFormat` loads the small side to skip
  * non-matching records at scan time, `CORE/mapred/join/`): build a
  * compact bloom filter over the dimension side's join keys, probe it on
  * the fact side BEFORE the join's shuffle, then run the real join for
  * exactness.
  *
  * Why this matters at 100 TB: a selective dim-side predicate (e.g. "the
  * 4% of suppliers in one nation") means ~96% of fact rows can never find
  * a partner, yet a plain shuffle join serializes, shuffles, and sorts all
  * of them before discovering that. The bloom probe rejects them at the
  * scan, so the shuffle carries only (matches + ε false positives). This
  * is exactly Spark's own AQE runtime-filter design (SPARK-32268) —
  * reused natively: the build side aggregates with Catalyst's
  * `BloomFilterAggregate`, the probe side filters with
  * `BloomFilterMightContain` over a foldable binary literal, so the probe
  * stays inside whole-stage codegen (no UDF, no CodegenFallback in the
  * fact-scan hot path).
  *
  * Correctness is unconditional: bloom filters have no false negatives,
  * so every true match survives the probe, and the subsequent real join
  * removes the false positives — the result is bit-identical to the
  * unpruned join (BloomJoinSpec pins this), which is why the registered
  * query is fully oracle-checkable.
  *
  * Driver contract: the built filter is ONE row of `numBits/8` bytes
  * (1 MiB at the 8M-bit default) — bounded by construction, never by the
  * data; collecting it is the same driver roundtrip Spark's own
  * dynamic-partition-pruning subquery performs. Both sides hash with
  * codegen'd `xxhash64`, matching `InjectRuntimeFilter`'s construction.
  */
object BloomJoin {

  /** Aggregate `dim`'s join key into a serialized bloom filter (one
    * bounded binary row collected to the driver).
    *
    * @param ndv     expected distinct keys on the build side — sizes the
    *                filter's hash count (must be ≤ Spark's
    *                `runtimeFilter` 4M-item cap)
    * @param numBits filter size in bits; the default 8M bits ≈ 1 MiB
    *                gives < 1% false positives up to ~1M distinct keys
    */
  def buildFilter(dim: DataFrame, key: Column,
                  ndv: Long = 1000000L, numBits: Long = 8388608L): Array[Byte] = {
    graft.functions.GraftFunctions.register(dim.sparkSession)
    dim.select(
        call_function("graft_bloom_agg", xxhash64(key), lit(ndv), lit(numBits))
          .as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Filter `fact` to rows whose `key` might be in the serialized filter
    * `bytes`. The filter bytes ride into the plan as a foldable literal,
    * so the probe predicate is codegen'd straight into the scan stage. */
  def probe(fact: DataFrame, key: Column, bytes: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.register(fact.sparkSession)
    fact.filter(call_function("graft_bloom_contains", lit(bytes), xxhash64(key)))
  }

  /** Inner equi-join with the fact side bloom-pruned before the shuffle.
    * Result ≡ `fact.join(dim, factKey === dimKey)` — the bloom is purely
    * a shuffle-volume optimization. */
  def prunedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     ndv: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val bytes = buildFilter(dim, col(dimKey), ndv, numBits)
    // qualified join keys: with unqualified columns a fact/dim key sharing
    // one name is ambiguous (or resolves to a trivially-true
    // self-comparison); the aliases pin each side explicitly
    probe(fact, col(factKey), bytes).as("__bj_f")
      .join(dim.as("__bj_d"),
        col(s"__bj_f.$factKey") === col(s"__bj_d.$dimKey"))
  }
}
