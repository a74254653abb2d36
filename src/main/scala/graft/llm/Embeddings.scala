package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column — the
  * north-star ANN surface (SURVEY.md §7.1 `engine.llm`). Brute-force
  * cosine is the exact baseline; sign-LSH (random hyperplanes) is the
  * scale path that avoids the all-pairs product.
  *
  * Numeric determinism: all arithmetic is a left-to-right fold in double
  * precision (`aggregate(sequence(...), 0.0D, ...)`), which the DuckDB
  * oracle mirrors with `list_reduce` — bit-identical results, so the
  * driver's exact double compare passes without rounding fudge.
  */
object Embeddings {

  /** Left-to-right double dot product of two array<float> columns —
    * the codegen'd [[graft.functions.FloatDotProduct]] expression (`dim`
    * kept for API symmetry; the expression iterates the arrays). */
  def dot(a: String, b: String, dim: Int): Column = expr(s"graft_dot($a, $b)")

  /** (id, vec, norm) with norm = sqrt(left-to-right sum of squares). */
  def withNorm(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sqrt(dot(vecCol, vecCol, dim)).as("nrm"))
  }

  /** Exact all-pairs cosine near-duplicates: (id1, id2, cos) for
    * cos >= threshold. This is the exact baseline — at scale replace the
    * raw cross join with [[signLshCandidates]] + this verify arithmetic
    * (same expression, candidate pairs only), or a block-matrix sweep. */
  def cosineDedup(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                  threshold: Double): DataFrame = {
    val v = withNorm(emb, idCol, vecCol, dim)
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot("a.vec", "b.vec", dim) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact all-pairs cosine near-duplicates with the 1-Bucket-Theta block
    * layout (Okcan & Riedewald, SIGMOD'11): same output as [[cosineDedup]],
    * but the physical plan is a shuffled EQUI-join on a block-pair key —
    * no BroadcastNestedLoopJoin, no full-corpus broadcast, per-task memory
    * bounded at n/blocks rows, load even across executors, AQE-splittable.
    *
    * Each vector lands in block `pmod(hash(id), B)`; the left side is
    * replicated to every partner block, the join matches `partner == blk`
    * and applies `id1 < id2` inside the join group, so every unordered
    * pair is verified exactly once. Shuffle volume is B·n + n rows (set
    * B ≈ sqrt(parallelism); the n² dot products dominate regardless).
    *
    * Why exact-quadratic is registered at all: the testdata's pair-cosine
    * distribution is a smooth continuum (measured at sf0.01: background
    * 99.99th pct = 0.4523, max non-qualifying pair 0.4494, min qualifying
    * 0.4516 — a 0.002 gap at the 0.45 threshold). With no similarity gap,
    * NO sublinear candidate scheme (sign-LSH included) can reach the 100%
    * recall an exact-threshold oracle demands: at cos 0.45 a 4-bit × 16
    * band sign-LSH misses ~4% of qualifying pairs while passing ~64% of
    * all background pairs. Exact semantics at a gapless threshold are
    * Ω(n²); this operator makes that n² distributed and memory-safe. For
    * real near-dup corpora (gap at cos ≥ 0.8) use [[signLshCandidates]] +
    * the same verify arithmetic — registered as `dedup_embedding_lsh`. */
  def cosineDedupBlocked(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                         threshold: Double, blocks: Int = 16): DataFrame = {
    val v = withNorm(emb, idCol, vecCol, dim)
      .withColumn("blk", pmod(hash(col("id")), lit(blocks)))
    val left = v.withColumn("partner",
      explode(sequence(lit(0), lit(blocks - 1))))
    left.as("a").join(v.as("b"),
        col("a.partner") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot("a.vec", "b.vec", dim) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Sign-LSH candidates + exact cosine verify: the scale path for
    * corpora whose near-dups are actually near (cos ≥ ~0.8, where band
    * collision is near-certain and background collision rare). Output is
    * always a SUBSET of [[cosineDedup]] at the same threshold (the verify
    * is exact); recall depends on the corpus gap — see
    * [[cosineDedupBlocked]]'s scaladoc for why a gapless threshold can't
    * be served losslessly by any candidate scheme. */
  def cosineDedupLsh(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                     threshold: Double, bits: Int = 64, bands: Int = 8): DataFrame = {
    val sigs = signLshSignatures(emb, idCol, vecCol, dim, bits)
    val cands = signLshCandidates(sigs, bits, bands)
    val v = withNorm(emb, idCol, vecCol, dim)
    cands
      .join(v.as("a"), col("id1") === col("a.id"))
      .join(v.as("b"), col("id2") === col("b.id"))
      .select(col("id1"), col("id2"),
        (dot("a.vec", "b.vec", dim) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact brute-force cosine top-k: for each query row, the k nearest
    * non-self vectors by (cos desc, id asc). The query side is broadcast
    * (small by construction); ranking is [[graft.ops.TopK.topKPerGroup]]
    * — a k-bounded buffer with map-side partial merge, so the shuffle
    * carries at most k rows per query per map task. The window
    * formulation (`row_number` over qid) would instead funnel the ENTIRE
    * scored corpus for a query through one task's sort — with few
    * queries, a handful of tasks each sorting n rows. */
  def bruteForceKnn(emb: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, dim: Int, k: Int): DataFrame = {
    val base = withNorm(emb, idCol, vecCol, dim)
    val q = withNorm(queries, idCol, vecCol, dim)
      .withColumnRenamed("id", "qid").withColumnRenamed("vec", "qvec")
      .withColumnRenamed("nrm", "qnrm")
    val scored = base.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor_id"),
        (dot("qvec", "vec", dim) / (col("qnrm") * col("nrm"))).as("cos"))
    graft.ops.TopK.topKPerGroup(scored, "qid", "cos", "neighbor_id", k)
      .select(col("qid").as("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** The deterministic ±1 hyperplane matrix as sign characters — one
    * '+'/'-' string of length `dim` per signature bit (splitmix64-style
    * mix of (bit, component), fixed forever). ONE definition shared by
    * the signature builder and the SQL oracle mirror
    * (`knn_ann_lsh`'s DuckDB twin inlines these rows as literals), so
    * the two can never diverge. */
  def planeSigns(bits: Int, dim: Int): Seq[String] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until bits).map(b => (0 until dim).map(i =>
      if ((mix(b.toLong * 131071 + i) & 1L) == 0L) '+' else '-').mkString)
  }

  /** Sign-LSH signature: bit b = sign of <v, r_b> where hyperplane r_b has
    * deterministic +-1 components s(i,b) = parity of xxhash64(i, b).
    * Vectors with high cosine agree on most bits (P[bit differs] =
    * theta/pi), so band-bucketing the signature yields near-neighbor
    * candidates without comparing all pairs. */
  def signLshSignatures(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                        bits: Int = 64): DataFrame = {
    // Deterministic +-1 hyperplanes as a literal (bits x dim) matrix —
    // a splitmix64-style mix of (b, i), fixed forever, shipped to
    // executors as a constant. Each bit is then one compact fold, not a
    // 4096-node expression tree (keeps whole-stage codegen happy).
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val planes: Seq[Seq[Float]] = planeSigns(bits, dim)
      .map(_.map(c => if (c == '+') 1.0f else -1.0f).toSeq)
    // signature = array of 64-bit words, so signatures LONGER than 64
    // bits are first-class: at 100 TB the bucket space must grow with the
    // corpus (see signLshCandidates' scale note), and the way to grow it
    // at constant recall is more signature bits
    val words = (bits + 63) / 64
    val wordCols = (0 until words).map { w =>
      val lo = w * 64
      (lo until math.min(lo + 64, bits)).map { b =>
        val proj = expr(s"graft_dot(vec, element_at(planes, ${b + 1}))")
        when(proj > 0, shiftleft(lit(1L), b - lo)).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
    }
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
        typedLit(planes).as("planes"))
      .select(col("id"), col("vec"), array(wordCols: _*).as("lsh"))
  }

  /** Candidate pairs sharing at least one of `bands` signature bands —
    * generated by [[TextDedup.candidatesFromBands]]'s one-shuffle
    * groupBy-bucket kernel (a self-join formulation costs two shuffle
    * reads of the band relation plus the distinct, for identical output).
    *
    * Scale note: a band has 2^(bits/bands) bucket values, and bucket
    * occupancy — hence in-bucket pair work — grows linearly with corpus
    * size once those saturate (the defaults give 4-bit/16-value bands:
    * deliberately coarse for recall at test scale). Unlike SimHash's
    * pigeonhole (where band width is free to grow at fixed recall), sign-
    * LSH recall is (1-(1-(1-θ/π)^w)^b), so at 100 TB keep the per-band
    * collision probability but grow the bucket space by lengthening the
    * SIGNATURE: e.g. bits = 256 with bands = 16 gives 16-bit buckets at
    * the same band count. Signatures are cheap (one dot per bit). */
  def signLshCandidates(sigs: DataFrame, bits: Int = 64, bands: Int = 16): DataFrame =
    TextDedup.candidatesFromBands(signLshBands(sigs, bits, bands))

  /** The banded signature relation (id, band, bh) — the shared kernel
    * under [[signLshCandidates]] (corpus-wide pair generation, for
    * dedup) and [[annLshKnn]] (query-side banding, for search). */
  def signLshBands(sigs: DataFrame, bits: Int = 64, bands: Int = 16): DataFrame = {
    val bandBits = bits / bands
    // band j occupies signature bits [j*w, (j+1)*w) across the 64-bit
    // words; a band that straddles a word boundary stitches its low part
    // (top of word w0) and high part (bottom of word w1). Masks keep
    // Spark's arithmetic shiftright from sign-extending into the bucket.
    def bh(j: Int): Column = {
      val lo = j * bandBits
      val w0 = lo / 64
      val w1 = (lo + bandBits - 1) / 64
      val off = lo % 64
      if (bandBits == 64) element_at(col("lsh"), w0 + 1)
      else if (w0 == w1)
        shiftright(element_at(col("lsh"), w0 + 1), off)
          .bitwiseAND(lit((1L << bandBits) - 1))
      else {
        val lowBits = 64 - off
        shiftright(element_at(col("lsh"), w0 + 1), off)
          .bitwiseAND(lit((1L << lowBits) - 1))
          .bitwiseOR(shiftleft(
            element_at(col("lsh"), w1 + 1)
              .bitwiseAND(lit((1L << (bandBits - lowBits)) - 1)),
            lowBits))
      }
    }
    sigs.select(col("id"),
      explode(array((0 until bands).map(j =>
        struct(lit(j).as("band"), bh(j).as("bh"))): _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", 2023 — public paper): k-means the embedding space
    * into cells (the [[Ivf]] coarse quantizer, shared build + cache),
    * then verify exact cosine only WITHIN each cell — semantic near-dups
    * sit close in embedding space, so co-clustered pairs capture them
    * while the cross-cell n² never happens. Output: (id1, id2, cos) for
    * co-clustered pairs with cos ≥ threshold — by construction a SUBSET
    * of [[cosineDedup]] and exactly equal to it restricted to
    * co-clustered ids (SemDedupSpec pins both).
    *
    * Scale shape: the within-cell join is an equi-join on (cell, block):
    * cells bound the candidate space (n²/nlist per cell on balanced
    * corpora), and the 1-Bucket-Theta sub-blocking from
    * [[cosineDedupBlocked]] bounds per-task memory even when one cell
    * swallows the corpus (the KMeans-collapse adversary) — a hot cell
    * degrades to the blocked-exact cost, never to one task holding the
    * cell. Shuffle volume: subBlocks·n + n rows. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                    threshold: Double, nlist: Int = 16, subBlocks: Int = 4,
                    corpusKey: String = "default", seed: Long = 42L): DataFrame = {
    val idx = Ivf.cachedIndex(emb, idCol, vecCol, dim, nlist, seed, corpusKey)
    val v = idx.assigned // (id, vec, cell, nrm), cell-partitioned + persisted
      .withColumn("blk", pmod(hash(col("id")), lit(subBlocks)))
    val left = v.withColumn("partner",
      explode(sequence(lit(0), lit(subBlocks - 1))))
    left.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.partner") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (dot("a.vec", "b.vec", dim) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** [[semanticDedup]] → duplicate clusters → surviving ids: connected
    * components over the co-clustered pair graph, keep the minimum id
    * per component (the family convention — [[DedupPipeline]]). */
  def semanticSurvivors(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                        threshold: Double, nlist: Int = 16,
                        corpusKey: String = "default"): DataFrame = {
    val pairs = semanticDedup(emb, idCol, vecCol, dim, threshold, nlist,
      corpusKey = corpusKey)
    val reps = DedupPipeline.components(pairs)
    emb.join(reps, emb(idCol) === reps("id"), "left_outer")
      .filter(col("rep").isNull || col("rep") === emb(idCol))
      .select(emb(idCol))
  }

  /** Approximate top-k: exact cosine ranking restricted to sign-LSH
    * candidate pairs. Recall measured against [[bruteForceKnn]] in the
    * spec; at 100 TB the candidate join replaces the O(n^2) product with
    * bucket-local joins. */
  def annLshKnn(emb: DataFrame, queryIds: Seq[Long],
                idCol: String, vecCol: String, dim: Int, k: Int,
                bits: Int = 64, bands: Int = 16): DataFrame = {
    val sigs = signLshSignatures(emb, idCol, vecCol, dim, bits)
    // band the QUERY side alone and broadcast it against the corpus
    // bands: candidates are generated per query (its bucket-mates only).
    // Running the corpus-wide pair kernel and filtering to the query ids
    // afterwards — the dedup formulation — would materialize every
    // in-bucket pair in the corpus (quadratic in hot-bucket occupancy)
    // to answer a driver-sized query list.
    val bandDf = signLshBands(sigs, bits, bands)
    val qBands = bandDf.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("band"), col("bh"))
    val sym = broadcast(qBands).join(bandDf, Seq("band", "bh"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"))
      .distinct() // a pair may share several bands
    val v = withNorm(emb, idCol, vecCol, dim)
    val scored = sym
      .join(v.as("a"), col("qid") === col("a.id"))
      .join(v.as("b"), col("nid") === col("b.id"))
      .select(col("qid"), col("nid"),
        (dot("a.vec", "b.vec", dim) / (col("a.nrm") * col("b.nrm"))).as("cos"))
    // bounded per-query top-k (see bruteForceKnn): a hot LSH bucket can
    // put a large share of the corpus in one query's candidate set, and a
    // window sort over that group would serialize it through one task
    graft.ops.TopK.topKPerGroup(scored, "qid", "cos", "nid", k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        col("rank"), col("cos"))
  }

  /** Cluster-balanced sampling (the SemDeDup-style diversity cap, Abbas
    * et al. 2023 §3 shape): assign every vector to its nearest of `k`
    * FIXED anchors — the k smallest ids, so the choice is deterministic
    * and the anchor set is k-bounded broadcast state — by exact cosine,
    * then keep at most `perCluster` rows per cluster by a pure integer
    * hash priority (`((id mod 1e9+7) · 2654435761) mod 1e9+7` — the
    * inner mod keeps the product under 2^63 for EVERY long id, so Spark
    * and the SQL oracle compute the same value with no silent wraparound;
    * seedable reproducible sampling, no RNG state). Returns
    * (cluster = anchor id, vec_id, rank ≤ perCluster).
    *
    * Scale shape: assignment is one broadcast pass (k dot products per
    * row, no shuffle), the argmax is ONE partial-aggregating groupBy on
    * id (`max(struct(cos, -cid))` — map-side combine collapses the k
    * candidates before the exchange), and the per-cluster cap is the
    * bounded-state top-k aggregator — a window sort over a hot cluster
    * would serialize O(cluster) rows through one task; this holds
    * O(perCluster) per task. Ties: higher cos, then smaller anchor id;
    * priority ties break by id. */
  def clusterBalancedSample(emb: DataFrame, idCol: String, vecCol: String,
                            dim: Int, k: Int, perCluster: Int): DataFrame = {
    val v = withNorm(emb, idCol, vecCol, dim)
    // a zero-norm anchor would make cos NaN for EVERY row, and NaN sorts
    // greatest — one degenerate vector among the k smallest ids would
    // collapse the whole sample into its "cluster"; anchors must be
    // directions, so zero vectors are not eligible
    val anchors = broadcast(v.filter(col("nrm") > 0).orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("vec").as("cvec"),
        col("nrm").as("cnrm")))
    val scored = v.crossJoin(anchors)
      .select(col("id"), col("cid"),
        (dot("vec", "cvec", dim) / (col("nrm") * col("cnrm"))).as("cos"))
    val best = scored.groupBy(col("id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("b"))
      .select((-col("b.ncid")).as("cluster"), col("id"),
        (((col("id") % lit(1000000007L)) * lit(2654435761L))
          % lit(1000000007L)).as("pri"))
    graft.ops.TopK.topKPerGroup(best, "cluster", "pri", "id", perCluster)
      .select(col("cluster"), col("id").as("vec_id"),
        col("rank").cast("int").as("samp_rank"))
  }
}
