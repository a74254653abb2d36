package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: uniform hash
  * sampling, per-stratum (per-source/domain) stratified sampling, and
  * mixture re-weighting toward a target domain distribution.
  *
  * Why hash sampling and not `rand()`: at 100 TB a sample must be
  * reproducible across reruns, retries, and repartitionings — `rand()`
  * is none of those (it is seeded per partition, so a lost executor
  * resamples differently). A salted digest of a stable row key is a
  * pure codegen'd column expression: same rows selected every run, on
  * any cluster layout, and the filter sits directly on the scan so
  * Parquet row groups are pruned before any shuffle.
  *
  * The selection rule compares a fixed-length hex prefix of
  * `md5(salt || key)` lexicographically against a hex threshold:
  * rate = value(threshold) / 16^len. Hex-string comparison (rather
  * than parsing to a number) keeps the DuckDB oracle mirror trivially
  * bit-exact — both engines produce identical lowercase-hex md5.
  */
object Sampling {

  /** All thresholds are 4 hex chars: rate granularity 1/65536. */
  val prefixLen = 4

  /** The salted per-row sampling key: first 4 hex chars of
    * md5(salt || key). Uniform over 16^4 values for any key set. */
  def sampleKey(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, prefixLen)

  /** Threshold that passes EVERY row: "fffg" sorts strictly above every
    * 4-hex-char sample key ('g' > 'f'), so `key < fullRateHex` is true
    * for all keys — including the ~1/65536 of rows whose key is exactly
    * "ffff", which a clamped "ffff" threshold with the strict `<` would
    * silently drop. Still 4 chars, so it composes with the per-stratum
    * `coalesce` compare in [[stratifiedSample]] unchanged. */
  val fullRateHex = "fffg"

  /** Threshold for a target rate, e.g. 0.25 -> "4000"; rates that round
    * to 65536/65536 map to [[fullRateHex]] (lossless pass-through). */
  def rateToHex(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    val n = math.round(rate * 65536)
    if (n >= 65536) fullRateHex else f"$n%04x"
  }

  /** Uniform deterministic sample at value(hexThreshold)/65536.
    * `hexThreshold` is a 4-char string compared lexicographically against
    * the hex sample keys — normally 4 hex digits from [[rateToHex]];
    * [[fullRateHex]] ("fffg") is the one sanctioned non-hex value, the
    * lossless pass-everything threshold. */
  def hashSample(df: DataFrame, keyCol: String, hexThreshold: String,
                 salt: String = "graft"): DataFrame = {
    require(hexThreshold.length == prefixLen,
      s"threshold must be $prefixLen chars (hex digits, or fullRateHex)")
    df.filter(sampleKey(col(keyCol), salt) < lit(hexThreshold))
  }

  /** Stratified deterministic sample: per-stratum hex thresholds, with
    * `defaultHex` for strata not in `rates` (each a 4-char threshold per
    * the [[hashSample]] contract — [[fullRateHex]] allowed).
    *
    * The rates ride in as a broadcast-joined table rather than a CASE
    * chain: a real corpus has thousands of strata (domains), and a
    * broadcast hash join keeps the probe map-side with no shuffle of
    * the corpus — the plan is scan -> broadcast probe -> filter. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, String], defaultHex: String,
                       salt: String = "graft"): DataFrame = {
    require((rates.values.toSeq :+ defaultHex).forall(_.length == prefixLen),
      s"all thresholds must be $prefixLen chars (hex digits, or fullRateHex)")
    val s = df.sparkSession
    import s.implicits._
    val rt = rates.toSeq.toDF("graft_stratum", "graft_thr")
    df.join(broadcast(rt), df(stratumCol) === col("graft_stratum"), "left_outer")
      .filter(sampleKey(col(keyCol), salt) <
        coalesce(col("graft_thr"), lit(defaultHex)))
      .select(df.columns.map(df(_)): _*)
  }

  /** Leakage-free train/validation/test assignment: the split is a pure
    * function of the GROUP key's salted hash, so every row sharing a
    * group value (all documents of a domain, all orders of a customer)
    * lands in the SAME split — the grouping is what prevents evaluation
    * leakage when near-identical rows cluster inside a group, which a
    * row-level split cannot guarantee. `cuts` are ordered
    * (name, upperHexExclusive) fences over the 4-hex-char sample key;
    * the last fence must be [[fullRateHex]] so every key is assigned.
    *
    * Scale shape: one codegen'd CASE over a md5 prefix — assigned
    * map-side on the scan, no shuffle, no state; reproducible across
    * reruns and repartitionings like every sampler here. */
  def groupSplit(df: DataFrame, groupCol: String,
                 cuts: Seq[(String, String)],
                 salt: String = "graft-split"): DataFrame = {
    require(cuts.nonEmpty, "at least one split required")
    require(cuts.forall(_._2.length == prefixLen),
      s"all fences must be $prefixLen chars (hex digits, or fullRateHex)")
    require(cuts.last._2 == fullRateHex,
      s"last fence must be fullRateHex so every key is assigned")
    require(cuts.map(_._2) == cuts.map(_._2).sorted &&
      cuts.map(_._2).distinct.size == cuts.size,
      "fences must be strictly increasing")
    val key = sampleKey(col(groupCol), salt)
    val assigned = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, fence), rest) => when(key < lit(fence), name).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** Deterministic epoch shuffle: a per-(epoch, row) sort key,
    * `md5(salt-epoch || key)`. Sorting any slice of the corpus by
    * `sort_key` yields the epoch's permutation — different epochs give
    * independent permutations, the same epoch always gives the same one
    * (so a resumed training run re-reads the identical order), and the
    * key is assigned map-side with no shuffle; the ORDER BY belongs to
    * the consumer (a range-partitioned sort at scale). */
  def epochShuffleKeys(df: DataFrame, keyCol: String, epochs: Int,
                       salt: String = "graft-epoch"): DataFrame =
    df.select(col(keyCol), explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("sort_key",
        md5(concat(lit(salt), lit("-"), col("epoch").cast("string"),
          lit("-"), col(keyCol).cast("string"))))

  /** Per-stratum mixture statistics + the resampling weight that moves
    * the corpus to a target token mixture: weight(s) = target_frac(s) *
    * total_tokens / tokens(s) (>1 = upsample, <1 = downsample). One
    * shuffle (the per-stratum agg, map-side partial); the grand total
    * joins back as a broadcast scalar, not a second pass over the data.
    * All doubles are single IEEE ops over exact integer sums, so the
    * DuckDB mirror matches bit-for-bit. */
  def mixtureWeights(docs: DataFrame, stratumCol: String, textCol: String,
                     targets: Map[String, Double],
                     defaultTarget: Double): DataFrame = {
    val toks = size(split(col(textCol), " ")).cast("long")
    val per = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(toks).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"))
    val target = targets.toSeq.sortBy(_._1)
      .foldRight(lit(defaultTarget): Column) { case ((k, v), rest) =>
        when(col("stratum") === k, lit(v)).otherwise(rest)
      }
    per.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("actual_frac"),
        target.as("target_frac"),
        (target * col("total_tokens").cast("double")
          / col("n_tokens").cast("double")).as("weight"))
  }

  /** EXACT-k-per-stratum deterministic sample: the k rows with the
    * largest salted md5 rank in each stratum (exactly min(k, |stratum|)
    * rows — where [[stratifiedSample]]'s rate threshold only hits a
    * target size in expectation). Rows ride the bounded
    * [[graft.ops.TopK]] buffer — O(k) state per stratum per task,
    * map-side partial merge, at most k rows per stratum per task on the
    * shuffle — so a billion-row stratum never sorts in one task (the
    * row_number formulation would).
    *
    * The rank is the first 13 hex chars of md5(salt ‖ id) as an integer:
    * 52 bits, exactly representable in the buffer's double, and
    * reproducible in any engine with md5 (the DuckDB oracle casts the
    * same prefix through '0x…'::BIGINT). Prefix property: the exact-k
    * sample is a superset of the exact-j sample for j < k (same order,
    * shorter cut), so growing a sample never resamples. */
  def exactKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int, salt: String): DataFrame = {
    val rank = conv(substring(
        md5(concat(lit(salt), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double")
    graft.ops.TopK.topKPerGroupStr(
        df.withColumn("__rank", rank), stratumCol, "__rank", idCol, k)
      .select(col(stratumCol), col(idCol), col("rank"))
  }

  /** 2^52 — the one-past-max of the 13-hex-char md5 rank domain, exactly
    * representable as a double. */
  private val maxRankDouble = 4503599627370496.0d

  /** Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
    * estimation of arbitrary subset sums", JACM 54(6), 2007 — public
    * paper): a WEIGHT-sensitive sample of exactly min(k, n) rows that
    * supports unbiased subset-sum estimation — the training-data use is
    * sampling documents proportionally to token count while still being
    * able to estimate any subgroup's true token total from the sample
    * alone. Each row gets priority p = u / w with u uniform; the sample
    * is the k SMALLEST priorities (heavy rows get small priorities, so
    * inclusion probability rises with weight), and with τ the (k+1)-th
    * smallest priority, ŵ = max(w, 2^52/τ) is the Horvitz–Thompson-style
    * weight estimate: E[Σ_S ŵ · 1(i∈S)] = w_i per row, so any subset's
    * ŵ-sum unbiasedly estimates its true weight-sum.
    *
    * Everything is deterministic and cross-engine bit-exact BY
    * CONSTRUCTION: u is the salted 52-bit md5 rank (the same digest
    * machinery as [[exactKPerStratum]], reproducible anywhere, +1 so
    * u ∈ [1, 2^52] and priorities stay finite and positive), and both
    * p = u/w and ŵ's 2^52/τ are single correctly-rounded IEEE divisions
    * of exact integers — no `pow`/`ln` as in exponential-key weighted
    * reservoirs (Efraimidis–Spirakis), whose transcendental keys are NOT
    * guaranteed to reproduce across engines. That choice is what lets
    * the registry query be oracle-hashed rather than rows-only.
    *
    * Scale: one scan assigns priorities map-side; the global k+1-smallest
    * is TakeOrderedAndProject (per-partition bounded top-k, no full
    * sort); ranking and τ-extraction then run over k+1 rows. Weights
    * must be positive integers — w ≤ 0 would make p non-positive or
    * divide by zero (the caller owns that contract, same as rate bounds
    * in [[rateToHex]]).
    *
    * Output: (id, weight, priority, rank, w_est), rank 1..min(k,n) by
    * (priority asc, id asc); when n ≤ k the whole input returns with
    * ŵ = w (τ undefined — nothing was excluded, the estimate is exact).
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val u = conv(substring(
        md5(concat(lit(salt), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long") + lit(1L)
    val pri = u.cast("double") / col(weightCol).cast("double")
    val top = df
      .select(col(idCol).as("id"), col(weightCol).cast("long").as("weight"),
        pri.as("priority"))
      .orderBy(col("priority"), col("id"))
      .limit(k + 1)
      .persist() // k+1 rows, read twice (ranking + τ)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("priority"), col("id"))))
    val tau = ranked
      .agg(max(when(col("rank") === k + 1, col("priority"))).as("tau"))
    ranked.filter(col("rank") <= k)
      .crossJoin(broadcast(tau))
      .select(col("id"), col("weight"), col("priority"), col("rank"),
        greatest(col("weight").cast("double"),
          coalesce(lit(maxRankDouble) / col("tau"), lit(0.0d))).as("w_est"))
  }
}
