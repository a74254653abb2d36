package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity joins: all pairs whose (prefix-truncated)
  * texts are within Levenshtein distance `t`, with the exact distance —
  * the string-similarity-join family the shingle-based dedup operators
  * (Jaccard / MinHash, [[TextDedup]]) cannot express, because edit
  * distance is order- and position-sensitive. Two shapes: the self-join
  * ([[editDistanceJoin]], corpus near-dup pairs) and the two-relation
  * join ([[editDistanceJoinBetween]], an ingest batch or benchmark set
  * matched against a reference corpus — the fuzzy analog of
  * `LineOps.decontaminate`'s exact n-gram overlap).
  *
  * Algorithm: partition-based candidate filtering in the PassJoin family
  * (Li, Deng & Feng, PVLDB 5(3) 2011). Each string of length `l` is split
  * into `t+1` contiguous segments (even partition). Pigeonhole: an edit
  * script of at most `t` operations touches at most `t` segments, so for
  * any pair within distance `t` at least one segment of the indexed
  * string appears in the other EXACTLY, shifted by at most the net
  * insertion/deletion count before it — i.e. by a position delta in
  * `[-t, t]`. Candidates are therefore the equi-join of
  *
  *   - the SEGMENT relation: one row per indexed string per segment,
  *     key `(l, segIdx, segStr)`, and
  *   - the PROBE relation: for each probing string `r` and each target
  *     length `l` in `[len(r)-t, len(r)+t]`, the substrings of `r` at
  *     each segment slot's position window, same key shape,
  *
  * followed by exact verification with a banded Levenshtein
  * (`levenshtein(s1, s2, t)` — O(t·n) early-exit DP, not the O(n²) full
  * matrix). The filter is lossless (proved by the pigeonhole argument
  * above; pinned empirically against brute force in EditSimilaritySpec),
  * so the output is EXACT — which is why these operators are
  * oracle-checked while MinHash/SimHash are rows-only.
  *
  * Scale (100 TB): no all-pairs anywhere. Per-string fan-out is a
  * constant in `t` — `(2t+1)` target lengths × `(t+1)` segments ×
  * `≤(2t+1)` shifts, pruned further by the existing-lengths semi-join
  * and the shift budget — and both relations shuffle on the selective
  * `(l, segIdx, segStr)` key, so the join is a plain hash-partitioned
  * equi-join Catalyst handles like any other. Verify cost is bounded by
  * the candidate-pair count.
  *
  * Degenerate-segment defense: like every member of the PassJoin family
  * the filter's selectivity comes from segment entropy, and the most
  * common real-world degeneracy — a constant header shared by the whole
  * corpus (boilerplate, format magic) — would turn the segments covering
  * it into corpus-sized buckets. The join therefore strips the
  * corpus-wide longest common prefix first: a prefix shared by EVERY
  * string is shared by every pair, and stripping a pair-common prefix
  * preserves edit distance exactly (the DP's first rows/columns are
  * forced matches). The corpus LCP is one cheap aggregate —
  * `LCP(corpus) = LCP(min(s), max(s))` under lexicographic min/max —
  * broadcast as a 1-row scalar. Interior boilerplate (shared MIDDLE
  * runs) remains the family's caveat; the shingle-based operators in
  * [[TextDedup]] are the right tool when content is mostly such
  * boilerplate.
  *
  * Reference ties: the reference's only fuzzy-matching surface is exact
  * key equality after normalization (SURVEY.md §2.6); this operator is
  * beyond-reference per the charter's dedup mandate.
  */
object EditSimilarity {

  /** All pairs within edit distance `t` on `substring(text, 1, prefixLen)`.
    * Output: `(id1, id2, dist)` with `id1 < id2` and `dist <= t` exact.
    *
    * `prefixLen` bounds per-row work (segment extraction, probe fan-out,
    * verify DP) by a constant, which is what makes the operator safe on
    * unbounded documents; pass a prefix at least as long as the longest
    * document to join on full texts.
    */
  def editDistanceJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      t: Int,
      prefixLen: Int): DataFrame = {
    checkArgs(t, prefixLen)
    requireIntegralId(docs, idCol)
    val k = t + 1
    val truncated = parallelize(truncate(docs, idCol, textCol, prefixLen))
    val base = strip(truncated, lcpOf(truncated))
    val long = base.filter(col("l") >= k)

    val candidates = segmentsOf(long, t)
      .join(probesOf(base, long.select(col("l")).distinct(), t), Seq("l", "i", "seg"))
      .filter(col("sid") =!= col("pid"))
      .select(least(col("sid"), col("pid")).as("id1"),
        greatest(col("sid"), col("pid")).as("id2"))

    // Pairs where BOTH strings are shorter than t+1 characters have no
    // segments to index; that residue is a trivially small length-banded
    // set (strings under t+1 chars), joined directly.
    val shortPairs = {
      val a = base.filter(col("l") < k).select(col("id").as("id1"), col("l").as("l1"))
      val b = base.filter(col("l") < k).select(col("id").as("id2"), col("l").as("l2"))
      a.join(b, col("id1") < col("id2") && abs(col("l1") - col("l2")) <= t)
        .select(col("id1"), col("id2"))
    }

    verify(candidates.union(shortPairs).distinct(), base, base, t)
  }

  /** Two-relation edit-distance-1 match via the symmetric-delete
    * (deletion-neighborhood) candidate generator — FastSS, Bocek,
    * Hunt, Stiller, Hausheer 2007; popularized as SymSpell. For each
    * string the variant set is {s} ∪ {s with one char deleted};
    * dist(a, b) ≤ 1 ⟺ the variant sets intersect (equality → identity
    * variant; ins/del → one side is the other's deletion; substitution
    * → deleting the differing position from both yields a common
    * variant), so an EXACT equi-join on variants finds every qualifying
    * pair and a thresholded levenshtein re-verifies (lossless end to
    * end).
    *
    * When to prefer this over [[editDistanceJoinBetween]]'s PassJoin
    * segments: SHORT keys over a SMALL alphabet (names, codes, ids).
    * Segment buckets live in alphabet^segLen space, so once the corpus
    * outgrows that space, bucket occupancy — and candidate fan-out —
    * grows linearly with N, i.e. candidates Θ(N²/alphabet^segLen): the
    * adversarial probe measured 17.5× wall for 2× records on dense
    * 7-digit keys. Variant buckets are WHOLE (len−1)-length strings, so
    * occupancy is bounded by the true dist ≤ 2 neighborhood density and
    * candidates stay Θ(N·len) — the probe's 2× scale costs ~2×. The
    * trade: variant fan-out is len+1 rows per string (vs t+1 segments),
    * so for LONG texts the segment path wins; both are exact, pick by
    * key shape.
    *
    * `blockCols` (columns of BOTH inputs) compose INTO the join key —
    * blocks prune candidates, not just results. Output:
    * (probe_id, ref_id, dist), dist ∈ {0, 1}. */
  def deletionJoinBetween(
      probe: DataFrame, probeId: String, probeText: String,
      ref: DataFrame, refId: String, refText: String,
      prefixLen: Int,
      blockCols: Seq[String] = Nil): DataFrame = {
    require(prefixLen > 1, s"prefixLen must exceed 1, got $prefixLen")
    requireIntegralId(probe, probeId); requireIntegralId(ref, refId)
    val variantExpr = expr(
      """concat(array(s), transform(sequence(1, length(s)),
        |  i -> concat(substring(s, 1, i - 1), substring(s, i + 1))))"""
        .stripMargin)
    def variants(df: DataFrame, id: String, text: String,
                 idAs: String): DataFrame =
      df.select(col(id).cast("long").as(idAs) +:
          substring(col(text), 1, prefixLen).as("s") +:
          blockCols.map(col): _*)
        .select(col(idAs) +: col("s") +:
          explode(variantExpr).as("v") +: blockCols.map(col): _*)
        .drop("s")
    val joinKeys = Seq("v") ++ blockCols
    val cands = variants(probe, probeId, probeText, "pid")
      .join(variants(ref, refId, refText, "sid"), joinKeys)
      .select(col("pid").as("id1"), col("sid").as("id2"))
      .distinct()
    val baseP = truncate(probe, probeId, probeText, prefixLen)
      .withColumnRenamed("s0", "s")
    val baseR = truncate(ref, refId, refText, prefixLen)
      .withColumnRenamed("s0", "s")
    verify(cands, baseP, baseR, 1)
      .withColumnsRenamed(Map("id1" -> "probe_id", "id2" -> "ref_id"))
  }

  /** Two-relation variant: every `(probe_id, ref_id, dist)` with the
    * probing side (an ingest batch, a benchmark set) within distance `t`
    * of a reference-corpus string. The REFERENCE side is the one
    * segmented/indexed; the probe side only enumerates substrings — the
    * same asymmetry as [[TextDedup.incrementalMinhashLsh]], so a small
    * batch against a large corpus costs batch-sized probe fan-out plus
    * one equi-join against the corpus's segment relation. The common-
    * prefix strip uses the LCP across BOTH relations (a prefix shared by
    * every string of both sides is shared by every cross pair).
    */
  def editDistanceJoinBetween(
      probe: DataFrame, probeId: String, probeText: String,
      ref: DataFrame, refId: String, refText: String,
      t: Int,
      prefixLen: Int): DataFrame = {
    checkArgs(t, prefixLen)
    requireIntegralId(probe, probeId); requireIntegralId(ref, refId)
    val k = t + 1
    val truncP = parallelize(truncate(probe, probeId, probeText, prefixLen))
    val truncR = parallelize(truncate(ref, refId, refText, prefixLen))
    val lcp = lcpOf(truncP.unionByName(truncR))
    val baseP = strip(truncP, lcp)
    val baseR = strip(truncR, lcp)
    val longR = baseR.filter(col("l") >= k)

    val candidates = segmentsOf(longR, t)
      .join(probesOf(baseP, longR.select(col("l")).distinct(), t), Seq("l", "i", "seg"))
      .select(col("pid").as("id1"), col("sid").as("id2"))

    // Residue: reference strings too short to segment, matched by the
    // length band alone (probe side is then at most k+t-1 chars too).
    val shortPairs = {
      val a = baseP.filter(col("l") < k + t).select(col("id").as("id1"), col("l").as("l1"))
      val b = baseR.filter(col("l") < k).select(col("id").as("id2"), col("l").as("l2"))
      a.join(b, abs(col("l1") - col("l2")) <= t).select(col("id1"), col("id2"))
    }

    verify(candidates.union(shortPairs).distinct(), baseP, baseR, t)
      .withColumnsRenamed(Map("id1" -> "probe_id", "id2" -> "ref_id"))
  }

  private def checkArgs(t: Int, prefixLen: Int): Unit = {
    require(t >= 1, s"threshold must be >= 1, got $t")
    require(prefixLen > t, s"prefixLen must exceed the threshold, got $prefixLen <= $t")
  }

  /** The candidate machinery keys on ids cast to long (compact shuffle
    * keys, total tie-break order). A non-integral id would silently cast
    * to null and produce garbage where the unpruned path works — fail
    * fast instead. Map string ids to longs first (zipWithIndex /
    * monotonically_increasing_id) or use the unpruned exact path. For
    * integral ids the cast is order-preserving, so `(dist, id)`
    * tie-breaks match the uncast path exactly. */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val tn = df.schema(idCol).dataType.typeName
    require(Set("byte", "short", "integer", "long").contains(tn),
      s"id column '$idCol' must be an integral type, got $tn — " +
        "the pruned join keys on ids cast to long; non-numeric ids " +
        "would silently become null. Assign long ids first, or use the " +
        "unpruned path (EntityResolution.linkBest / brute-force verify).")
  }

  private def truncate(docs: DataFrame, idCol: String, textCol: String,
      prefixLen: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      substring(col(textCol), 1, prefixLen).as("s0"))

  /** The segment/probe fan-out and the banded DP are CPU-bound per-row
    * work fed straight off the corpus scan — a corpus that arrives in
    * fewer splits than the cluster has slots (one small parquet file at
    * bench scale) runs the ENTIRE candidate machinery in those few
    * tasks (measured: a single 2.5 s task was the whole of
    * dedup_edit_distance at sf0.1). Spread the truncated relation —
    * id + ≤prefixLen chars per row, far smaller than the raw corpus —
    * across the slots first; when the scan already has enough splits
    * (any real 100 TB corpus), this is a no-op branch, not an extra
    * shuffle. */
  private def parallelize(df: DataFrame): DataFrame =
    graft.core.Spread.toSlots(df)

  /** Corpus-wide longest-common-prefix length as a 1-row broadcast
    * scalar: LCP(all strings) == LCP(lexicographic min, lexicographic
    * max), because any position where min and max agree is agreed on by
    * every string between them. */
  private def lcpOf(truncated: DataFrame): DataFrame =
    truncated
      .agg(min(col("s0")).as("lo"), max(col("s0")).as("hi"))
      .select(expr(
        """coalesce(
          |  try_element_at(filter(sequence(1, least(length(lo), length(hi))),
          |    i -> substring(lo, i, 1) <> substring(hi, i, 1)), 1) - 1,
          |  least(length(lo), length(hi)), 0)""".stripMargin).as("lcp"))

  private def strip(truncated: DataFrame, lcp: DataFrame): DataFrame =
    truncated
      .crossJoin(broadcast(lcp))
      .select(col("id"), expr("substring(s0, lcp + 1)").as("s"))
      .withColumn("l", length(col("s")))

  // Even partition layout, 0-based: with base = l div k, rem = l % k,
  // segment i has length base + (i >= k - rem) and starts at
  // i*base + max(0, i - (k - rem)). Segments tile the string exactly.
  private def segLen(k: Int, l: String, i: String) =
    s"(($l div $k) + IF($i >= $k - ($l % $k), 1, 0))"
  private def segStart(k: Int, l: String, i: String) =
    s"($i * ($l div $k) + greatest(0, $i - ($k - ($l % $k))))"

  /** SEGMENT relation: (sid, l, i, seg) — t+1 rows per indexed string. */
  private def segmentsOf(long: DataFrame, t: Int): DataFrame = {
    val k = t + 1
    long
      .select(col("id"), col("l"),
        explode(expr(
          s"""transform(sequence(0, $t), i -> named_struct(
             |  'i', i,
             |  'seg', substring(s, 1 + ${segStart(k, "l", "i")}, ${segLen(k, "l", "i")})))"""
            .stripMargin)).as("e"))
      .select(col("id").as("sid"), col("l"), col("e.i").as("i"), col("e.seg").as("seg"))
  }

  /** PROBE relation: (pid, l, i, seg) — for every probing string r (ANY
    * length), every indexable target length l, segment slot i, and shift
    * d with an in-bounds substring. Two lossless prunes keep the fan-out
    * small:
    *   1. only target lengths that EXIST in the segment index are
    *      probed — `lengths` is at most `prefixLen` rows (lengths are
    *      bounded by the truncation), broadcast into a semi-join. With
    *      truncation concentrating most documents on l == prefixLen
    *      this removes ~(2t)/(2t+1) of the fan-out.
    *   2. the shift budget: a shift of d needs |d| ins/del before the
    *      untouched segment and the remaining length change must be
    *      absorbed after it, so |d| + |(lr - l) - d| <= t — halving
    *      the shift window at equal lengths vs the naive |d| <= t.
    * No distinct(): coincident substrings from overlapping (l, d)
    * combinations are rare (the shift windows barely overlap after
    * prune 2) and each duplicate costs at most a constant-bounded extra
    * join row that the pair-level distinct absorbs — measured on the
    * documents corpus a probe-side distinct removed 91 of 1.57M rows
    * while adding the single largest shuffle in the plan. */
  private def probesOf(base: DataFrame, lengths: DataFrame, t: Int): DataFrame = {
    val k = t + 1
    base
      .select(col("id"), col("s"), col("l").as("lr"))
      .select(col("id"), col("s"), col("lr"),
        explode(expr(s"sequence(greatest(lr - $t, $k), greatest(lr + $t, $k))"))
          .as("l"))
      .join(broadcast(lengths), "l")
      .select(col("id"), col("l"),
        col("s"), col("lr"),
        explode(expr(
          s"""flatten(transform(sequence(0, $t), i ->
             |  filter(
             |    transform(
             |      filter(sequence(-$t, $t),
             |             d -> abs(d) + abs((lr - l) - d) <= $t),
             |      d -> named_struct(
             |        'i', i,
             |        'q', ${segStart(k, "l", "i")} + d,
             |        'n', ${segLen(k, "l", "i")})),
             |    p -> p.q >= 0 AND p.q + p.n <= lr)))""".stripMargin)).as("p"))
      .select(col("id").as("pid"), col("l"), col("p.i").as("i"),
        expr("substring(s, 1 + p.q, p.n)").as("seg"))
  }

  /** Exact verification: banded Levenshtein on the candidate pairs only
    * (returns -1 past the threshold — filtered).
    *
    * The candidate relation is explicitly re-hashed to the session's
    * shuffle-partition count first: its bytes are tiny (two longs per
    * pair), so AQE's byte-based coalescing collapses the post-distinct
    * read to ONE partition — and the verify's per-row cost (an O(t·n)
    * DP per pair) is the expensive part, which then ran single-threaded
    * (measured: a 2.6 s one-task stage was the whole of
    * dedup_edit_distance's cost at sf0.1). The explicit count pins the
    * partitioning against coalescing; the extra exchange moves only
    * pair ids (guide §2.5: byte-sized partitions are not CPU-sized
    * partitions). */
  private def verify(pairs: DataFrame, baseA: DataFrame, baseB: DataFrame,
      t: Int): DataFrame = {
    val s1 = baseA.select(col("id").as("id1"), col("s").as("s1"))
    val s2 = baseB.select(col("id").as("id2"), col("s").as("s2"))
    pairs
      .repartition(pairs.sparkSession.sessionState.conf.numShufflePartitions,
        col("id1"), col("id2"))
      .join(s1, "id1").join(s2, "id2")
      .withColumn("dist", levenshtein(col("s1"), col("s2"), t))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
