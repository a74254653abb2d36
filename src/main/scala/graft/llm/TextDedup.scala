package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Text deduplication for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and exact n-gram Jaccard with
  * prefix filtering. Beyond-reference north-star surface (SURVEY.md §7.1
  * `engine.llm`); the reference's only dedup is the `(record,null)` +
  * identity-reduce idiom (SURVEY.md §2.6).
  *
  * Scale design (100 TB): no all-pairs comparison anywhere on the Spark
  * side. Candidate pairs come from LSH band buckets (MinHash / SimHash) or
  * from a lossless prefix filter (AllPairs/PPJoin family); the exact
  * verification join only touches candidate pairs. Per-document state
  * (shingle set, 64-hash signature) is bounded by document length, never
  * by corpus size, and every step is a shuffle on a key Catalyst can hash-
  * partition — no driver-side collect.
  */
object TextDedup {

  /** Distinct word n-gram shingles per document: (id, shingle).
    * Codegen-friendly: split + transform over a sequence + explode — no
    * UDFs (higher-order functions stay inside WholeStageCodegen).
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // NO Spread here (r15 second-session A/B): every direct consumer of
    // the exploded relation (gram df counts, ranking, decontamination)
    // groupBys or joins right after — a shuffle that spreads the work
    // anyway — so widening the scan first is a pure extra exchange
    // (decontaminate_fuzzy 0.88→1.38, hybrid_rrf ~+0.5 with it). The one
    // consumer whose CPU-bound build DOES need input-split parallelism
    // (the band-index signature build) spreads at its own call site.
    val parts = (0 until n).map(j => s"element_at(w, i + $j)").mkString(", ' ', ")
    docs.select(col(idCol).as("id"), split(col(textCol), " ").as("w"))
      .select(col("id"),
        explode(expr(
          s"""CASE WHEN size(w) >= $n
             |THEN array_distinct(transform(sequence(1, size(w) - ${n - 1}),
             |     i -> concat($parts)))
             |ELSE array() END""".stripMargin)).as("shingle"))
  }

  /** (id, arr): the distinct word n-gram shingle SET per document, kept
    * as an array — the un-exploded form of [[shingles]]
    * (`explode(arr)` ≡ the shingle relation; docs with fewer than `n`
    * words carry an empty array, which explode drops). The array form is
    * what lets [[minhashSignaturesFromArrays]] compute signatures with
    * ZERO shuffle and [[verifyJaccardArrays]] verify candidates with a
    * map-side `array_intersect` — per-doc state stays bounded by
    * document length, exactly like the exploded form. */
  def shingleArrays(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val parts = (0 until n).map(j => s"element_at(w, i + $j)").mkString(", ' ', ")
    docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("w"))
      .select(col("id"),
        expr(
          s"""CASE WHEN size(w) >= $n
             |THEN array_distinct(transform(sequence(1, size(w) - ${n - 1}),
             |     i -> concat($parts)))
             |ELSE array() END""".stripMargin).as("arr"))
  }

  /** Exact dedup: hash-groupBy on a normalized content digest; keeps the
    * smallest id as the representative. Output: (digest, keep_id, copies).
    * At 100 TB this is one shuffle on a 128-bit key with map-side partial
    * aggregation — the canonical scalable exact dedup. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), md5(lower(col(textCol))).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("copies"))

  /** MinHash signatures: for each doc, an array of `numHashes` min-hash
    * values over its shingle set. The shingle string is hashed ONCE
    * (xxhash64); the k-th family member re-mixes the resulting 8-byte
    * long with seed k — k times cheaper than re-hashing the string per
    * family member, same independence. All codegen'd, map-side partial
    * min before the per-doc shuffle. */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 64): DataFrame = {
    val mins = (0 until numHashes).map(k =>
      min(xxhash64(col("h0"), lit(k))).as(s"h$k"))
    sh.withColumn("h0", xxhash64(col("shingle")))
      .groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
  }

  // NOTE (r15 optimization round): a zero-shuffle array formulation of
  // the signatures (per-doc `transform(sequence(0,127), k ->
  // array_min(transform(hs, h -> xxhash64(h, k))))` over the shingle
  // array, string hash hoisted) was implemented and MEASURED SLOWER
  // (dedup_minhash_lsh 2.4 s → 5.1 s at sf0.1): Spark's higher-order
  // functions evaluate their lambdas interpreted with per-element
  // boxing, while the exploded groupBy form hashes and min-combines
  // inside whole-stage codegen — the removed shuffle (one partial row
  // of numHashes longs per doc per partition) is far cheaper than the
  // interpreted inner loop. Kept the codegen'd aggregate.

  /** LSH banding: (id, band, band_hash) — one row per band. Docs sharing
    * any (band, band_hash) bucket become candidate pairs. bands*rowsPerBand
    * must equal the signature length. */
  def lshBands(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    sigs.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate pairs (id1 < id2) from any shared LSH bucket: ONE shuffle
    * on (band, bh) gathers each bucket's ids, pairs are generated
    * map-side from the sorted list, then distinct'd (the pair set after
    * banding is tiny). A self-join formulation costs two shuffle reads
    * of the band relation plus the distinct; this is strictly less
    * movement with the identical output. Bucket sizes are small by
    * construction (that's what banding is FOR), so the in-bucket
    * quadratic is bounded; a pathological bucket would hurt the join
    * formulation identically. */
  def candidatesFromBands(bandDf: DataFrame): DataFrame =
    bucketPairs(bandDf, Nil)
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()

  /** The one-shuffle bucket-pairing kernel shared by [[candidatesFromBands]]
    * and [[simhashPairs]]: group the band relation on (band, bh), sort each
    * bucket's (id, payload…) structs, generate the in-bucket pairs map-side.
    * `extra` columns (e.g. the SimHash signature) ride along in the struct
    * so downstream per-pair computation needs no join back to the source —
    * each id appears at most once per bucket (one row per doc per band), so
    * the struct sort is still a sort by id. */
  private def bucketPairs(bandDf: DataFrame, extra: Seq[Column]): DataFrame =
    bandDf.groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(struct(col("id") +: extra: _*))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(xs) - 2),
          |  i -> transform(slice(xs, i + 2, size(xs) - i - 1),
          |       j -> struct(xs[i] AS x, j AS y))))""".stripMargin)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))

  /** Exact Jaccard over shingle sets for the given candidate pairs only.
    * Output: (id1, id2, jaccard). The intersection is computed by joining
    * the exploded shingle relation twice — distributed, never collects a
    * document list to the driver. */
  def verifyJaccard(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    // only shingles appearing in >= 2 docs can be shared — dropping the
    // df=1 long tail (the vast majority) before the intersection join is
    // exactness-preserving and cuts the join input ~10x
    val shared = sh.join(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("shingle")),
      "shingle")
    val inter = cands
      .join(shared.as("a"), col("id1") === col("a.id"))
      .join(shared.as("b"), col("id2") === col("b.id") && col("a.shingle") === col("b.shingle"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("s1"), col("id1") === col("s1.id"))
      .join(sizes.as("s2"), col("id2") === col("s2.id"))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / (col("s1.n") + col("s2.n") - col("inter")))
          .as("jaccard"))
  }

  /** Exact Jaccard for the candidate pairs from the shingle-ARRAY
    * relation: attach each side's array with an equi-join, intersect
    * map-side (`array_intersect` over the distinct arrays ≡ the exact
    * intersection count), divide. Bit-identical to [[verifyJaccard]] —
    * same long counts into the same single double division; a shingle
    * shared by a pair has global df ≥ 2 by definition, so the df-filter
    * there never changes the intersection it computes.
    *
    * Plan shape (guide §2.4/§3.1): the LSH candidate relation is tiny
    * relative to the corpus, so BOTH attach joins build on the pair
    * side (broadcast at bench scale, shuffled-hash beyond) and the
    * shingle-array relation streams ONCE per side with no groupBy, no
    * df relation, no intersection-count shuffle — the exploded
    * formulation paid 5 exchanges (df groupBy, df join, the double
    * candidate join's agg, two size joins) to compute the same three
    * integers this computes in one projection. Per-row cost is
    * O(|arr1| + |arr2|), bounded by document length, corpus-size-free. */
  def verifyJaccardArrays(cands: DataFrame, shArr: DataFrame): DataFrame =
    cands
      .join(shArr.as("va"), col("id1") === col("va.id"))
      .join(shArr.as("vb"), col("id2") === col("vb.id"))
      .select(col("id1"), col("id2"),
        size(array_intersect(col("va.arr"), col("vb.arr"))).cast("long").as("inter"),
        size(col("va.arr")).cast("long").as("n1"),
        size(col("vb.arr")).cast("long").as("n2"))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .as("jaccard"))

  /** Exact Jaccard via ONE self-join of the shared (df>=2) shingle
    * relation: each shared shingle contributes one (id1, id2) row, the
    * groupBy counts them — the intersection sizes of every overlapping
    * pair in a single pass. `cands` then semi-filters the output (same
    * result as [[verifyJaccard]] when cands covers all qualifying pairs).
    * Cheaper than the candidate-driven double join when candidates are
    * dense (crowded corpora); the candidate-driven form wins when LSH
    * leaves only a few pairs. Hot shingles cost df^2 pair-rows here — at
    * 100 TB cap/split them (AQE skew split) or fall back to
    * candidate-driven verification. */
  def verifyJaccardDirect(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = sh.join(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("shingle")),
      "shingle")
    val inter = shared.as("a")
      .join(shared.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(cands, Seq("id1", "id2"), "left_semi")
    inter
      .join(sizes.as("s1"), col("id1") === col("s1.id"))
      .join(sizes.as("s2"), col("id2") === col("s2.id"))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / (col("s1.n") + col("s2.n") - col("inter")))
          .as("jaccard"))
  }

  /** Exact Jaccard with the HOT-SHINGLE SPLIT — the fallback documented
    * on [[verifyJaccardDirect]], wired in. The direct self-join costs
    * df² pair-rows per shingle, so one universal shingle (df = corpus
    * size) is a quadratic blowup even when almost no pair is a
    * candidate. Split by document frequency:
    *   - cold (2 <= df <= dfCap): direct self-join; total cost
    *     Σ_cold df² <= dfCap · |sh| — linear in corpus size with a dfCap
    *     factor;
    *   - hot (df > dfCap): candidate-driven double join; cost
    *     |cands| · hot-shingles-per-doc, independent of df.
    * The two partial intersection counts sum to the exact intersection,
    * so the result equals [[verifyJaccard]] for any candidate superset —
    * losslessness pinned in LlmSpec, blowup-resistance probed in
    * ScaleProbe's universal-shingle corpus. */
  def verifyJaccardSplit(cands: DataFrame, sh: DataFrame, dfCap: Int): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val dfRel = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val cold = sh.join(
      dfRel.filter(col("df").between(2, dfCap)).select(col("shingle")), "shingle")
    val hot = sh.join(
      dfRel.filter(col("df") > dfCap).select(col("shingle")), "shingle")
    val interCold = cold.as("a")
      .join(cold.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("cnt"))
      .join(cands, Seq("id1", "id2"), "left_semi")
    val interHot = cands
      .join(hot.as("a"), col("id1") === col("a.id"))
      .join(hot.as("b"),
        col("id2") === col("b.id") && col("a.shingle") === col("b.shingle"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("cnt"))
    val inter = interCold.unionByName(interHot)
      .groupBy(col("id1"), col("id2")).agg(sum(col("cnt")).as("inter"))
    inter
      .join(sizes.as("s1"), col("id1") === col("s1.id"))
      .join(sizes.as("s2"), col("id2") === col("s2.id"))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / (col("s1.n") + col("s2.n") - col("inter")))
          .as("jaccard"))
  }

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * With 32 bands x 4 rows, a pair at J >= 0.85 is missed with
    * probability (1 - J^4)^32 < 1e-13 — LSH prunes candidates, the exact
    * verify step decides, so the output matches an all-pairs oracle.
    *
    * Caching contract: the shingle relation is `persist`ed
    * (MEMORY_AND_DISK) and NOT unpersisted here — the returned plan still
    * reads it lazily, so there is no safe unpersist point inside this
    * method. Callers composing many dedup calls in a long-lived session
    * should `spark.catalog.clearCache()` between them (Verify/Bench do),
    * or build from the lower-level pieces and manage the persist
    * themselves. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.8, shingleN: Int = 3,
                 numHashes: Int = 128, bands: Int = 32): DataFrame = {
    // the shingle-ARRAY relation feeds three consumers (signatures and
    // both sides of the verify join) — cache it once instead of
    // re-running the split/transform per branch. persist (not
    // localCheckpoint): lazy, so no job runs at plan construction, and
    // lineage is kept, so a lost executor recomputes its blocks instead
    // of failing the job. The cache entry lives in the session's
    // CacheManager until the caller unpersists (Verify/Bench clear the
    // cache between queries; long-lived sessions should
    // spark.catalog.clearCache() or use the lower-level pieces directly).
    //
    // r15 shape: ONE cached relation (the shingle arrays) feeds the
    // codegen'd signature aggregate (via a cheap explode) and both
    // sides of the array-intersect verify ([[verifyJaccardArrays]]) —
    // the verify step's five exchanges (df groupBy + df join +
    // intersection agg + two size joins) collapse into two small-side
    // joins over the cache. Output bit-identical (same hash chain,
    // same counts, same division).
    // spread the corpus across the task slots before the CPU-bound
    // shingle/signature build (guide §2.5/§6; no-op at real split counts)
    val shArr = shingleArrays(graft.core.Spread.toSlots(
        docs.select(col(idCol), col(textCol))), idCol, textCol, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sh = shArr.select(col("id"), explode(col("arr")).as("shingle"))
    val cands = candidatesFromBands(
      lshBands(minhashSignatures(sh, numHashes), bands, numHashes / bands))
    verifyJaccardArrays(cands, shArr).filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard similarity join with lossless prefix filtering
    * (AllPairs/Bayardo): order each doc's shingles by ascending global
    * document frequency; two docs with J >= t must share a shingle within
    * their first (n - ceil(t*n) + 1) rarest shingles, so joining prefixes
    * finds every qualifying pair without an all-pairs product.
    *
    * Same caching contract as [[minhashLsh]]: the persisted shingle
    * relation stays cached until the caller clears it. */
  def ngramJaccardJoin(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, shingleN: Int = 3,
                       dfCap: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same multi-consumer reuse (and the same persist-not-checkpoint
    // rationale) as minhashLsh: df ranking, prefix build, and the verify
    // join all read the shingle-array relation
    val shArr = shingleArrays(docs, idCol, textCol, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-doc shingle count rides out of the array for free (size(arr))
    // instead of a second count() window pass over the exploded relation
    // r15 NOTE: widening this pipeline's caches to the task slots (the
    // [[graft.core.Spread]] treatment that cut the sparse LSH paths ~30%)
    // was tried in BOTH spots — spreading docs before shingleArrays, and
    // repartition+persist of this exploded relation — and measured 1.5–
    // 2.4 s SLOWER (3.49 → 5.0/5.9 at sf0.1): a multi-partition
    // InMemoryRelation reports a much larger estimated size (per-batch
    // buffer overhead × partitions), which pushes the cached relation
    // past the broadcast threshold and flips the dense verify join's
    // broadcasts to sort-merge (plan check: 10 BHJ → 30 BHJ + 2 SMJ with
    // duplicated subtrees). The serial one-partition cache reads cost
    // less than the lost broadcasts; kept as-is.
    val sh = shArr.select(col("id"), size(col("arr")).as("nsh"),
      explode(col("arr")).as("shingle"))
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(df, "shingle")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))))
    val prefix = ranked
      .filter(col("rk") <= col("nsh") - ceil(col("nsh") * threshold) + lit(1))
      .select(col("id"), col("shingle"), col("nsh"))
    // length filter (lossless): J >= t forces t·|y| <= |x| <= |y|/t, so
    // size-mismatched pairs are pruned at candidate generation — on
    // heterogeneous corpora this cuts the crowded-shingle pair fan-out
    // before the verify join ever sees it
    val cands = prefix.as("x")
      .join(prefix.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id") &&
          col("x.nsh") >= col("y.nsh") * threshold &&
          col("y.nsh") >= col("x.nsh") * threshold)
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
    // verify stays on the split join here (measured: at this LOW
    // threshold the prefix filter admits a dense candidate set whose
    // per-pair array_intersect cost exceeds the split join's exchanges —
    // the array form won only on the sparse high-threshold LSH paths)
    verifyJaccardSplit(cands, sh, dfCap).filter(col("jaccard") >= threshold)
  }

  /** The persisted-index half of incremental dedup: the corpus's LSH band
    * relation (id, band, bh), meant to be WRITTEN ONCE (parquet,
    * partitioned or bucketed by (band, bh)) and joined against by every
    * subsequent ingest batch via [[incrementalMinhashLsh]]. Parameters
    * must match the ingest call exactly — a band layout mismatch silently
    * produces disjoint buckets, so both sides take them explicitly
    * instead of defaulting independently. */
  def minhashBandIndex(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, numHashes: Int = 128,
                       bands: Int = 32): DataFrame =
    // spread the corpus across task slots BEFORE the CPU-bound
    // shingle+signature build (guide §2.5/§6): this one-shot index build
    // is the measured case where a one-row-group scan serialized ~2.5 s
    // of per-row work; no-op at real split counts
    lshBands(minhashSignatures(
      shingles(graft.core.Spread.toSlots(
        docs.select(col(idCol), col(textCol))), idCol, textCol, shingleN),
      numHashes), bands, numHashes / bands)

  /** Persist a [[minhashBandIndex]] relation, partitioned by `band`: an
    * ingest probe joins on (band, bh), so each of its 32 band-bucketed
    * shuffle partitions reads only its own band's files. (Bucketing by
    * bh inside each band partition would also pre-sort the join side —
    * that needs a metastore table; the directory layout is the portable
    * 80 % of it.) Pair with [[graft.llm.IndexStore.ensure]] so a crash
    * mid-write reads back as absent, not as a partial index. */
  def saveBandIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("band").parquet(path)

  def loadBandIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental MinHash+LSH dedup — the production ingest shape: dedup a
    * NEW batch against an already-indexed corpus without re-hashing the
    * corpus. At 100 TB the corpus-side cost per ingest must be (a) one
    * bucket-equi-join of the small batch's bands against the persisted
    * [[minhashBandIndex]] relation and (b) re-shingling ONLY the corpus
    * docs that actually collided — never a corpus-wide signature rebuild.
    *
    * Output: (id1, id2, jaccard) for every qualifying pair INVOLVING a
    * new doc — both new-new (within the batch) and new-corpus. Pinned in
    * IncrementalDedupSpec: exactly equal to [[minhashLsh]] over
    * (corpus ∪ batch) minus its corpus-corpus pairs — the signatures are
    * per-doc, so batch-vs-index candidate generation loses nothing.
    *
    * `corpusDocs` is scanned once, column-pruned to (id, text), and
    * shingled only for candidate ids (the semi join filters before the
    * explode). Same persist contract as [[minhashLsh]]: the batch shingle
    * relation stays cached until the caller clears it. */
  def incrementalMinhashLsh(newDocs: DataFrame, corpusDocs: DataFrame,
                            index: DataFrame, idCol: String, textCol: String,
                            threshold: Double = 0.8, shingleN: Int = 3,
                            numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val newArr = shingleArrays(graft.core.Spread.toSlots(
        newDocs.select(col(idCol), col(textCol))), idCol, textCol, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // band relation persists too: it feeds BOTH the in-batch bucket kernel
    // and the index probe join, and recomputing it re-runs the whole
    // numHashes-column signature aggregation (measured 2× on the bench)
    val newBands = lshBands(minhashSignatures(
      newArr.select(col("id"), explode(col("arr")).as("shingle")), numHashes),
      bands, numHashes / bands)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // within-batch pairs: the usual one-shuffle bucket kernel
    val inBatch = candidatesFromBands(newBands)
    // cross pairs: batch bands probe the persisted corpus buckets — an
    // equi-join on (band, bh) sized by the BATCH, not the corpus
    val cross = newBands.as("n")
      .join(index.as("o"),
        col("n.band") === col("o.band") && col("n.bh") === col("o.bh") &&
          col("n.id") =!= col("o.id"))
      .select(least(col("n.id"), col("o.id")).as("id1"),
        greatest(col("n.id"), col("o.id")).as("id2"))
      .distinct()
    val cands = inBatch.unionByName(cross).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // re-shingle only the corpus docs that collided with the batch
    val candIds = cands.select(col("id1").as("cid"))
      .unionByName(cands.select(col("id2").as("cid"))).distinct()
    val corpusCandArr = shingleArrays(
      corpusDocs.join(candIds, corpusDocs(idCol) === col("cid"), "left_semi"),
      idCol, textCol, shingleN)
    // the batch may re-ingest an id the corpus already holds (the id1<id2
    // canonical form would otherwise double its shingle set): batch wins.
    // The combined relation persists: the verify join reads it from both
    // sides, and unpersisted the semi-join + shingle build re-ran per
    // consumer — this was the gap that made ingest cost 3× the
    // equivalent full dedup's verify
    val shArr = newArr.unionByName(
      corpusCandArr.join(newArr.select(col("id")).distinct(), Seq("id"),
        "left_anti"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    verifyJaccardArrays(cands, shArr).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over word-frequency features. bit b = sign of
    * sum(count * (+1 if bit b of xxhash64(word) else -1)). Identical word
    * multisets get identical signatures (deterministic recall for exact
    * dups); near-dups land within a small Hamming distance.
    *
    * One shuffle, not two: summing ±1 per word OCCURRENCE equals summing
    * ±count per distinct word, so the per-(id, word) count pre-aggregation
    * (a full extra shuffle of the word-level relation) is redundant — the
    * 64 bit-sums partial-aggregate map-side straight to the per-id
    * shuffle, which moves one 64-column partial row per (id, partition). */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        wordHash: Column => Column = xxhash64(_)): DataFrame = {
    // NO Spread (r15 second-session A/B): the bit-sum groupBy shuffles
    // the partial rows anyway and the exchange of the word arrays cost
    // more than the serialized explode saved (dedup_simhash 1.04→1.43
    // with it)
    val occ = docs.select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .select(col("id"), explode(col("ws")).as("word"))
      .filter(col("word") =!= "")
      .withColumn("h", wordHash(col("word")))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"s$b"))
    occ.groupBy(col("id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup candidates: pairs within `maxHamming` of each other.
    * Candidates come from equal-width LSH bands with the band count
    * chosen from the pigeonhole requirement: a pair within Hamming h
    * shares at least one untouched band as long as there are >= h+1
    * bands, so recall is guaranteed, not probabilistic. Using the FEWEST
    * sufficient bands (the smallest divisor of 64 that is >= h+1) makes
    * each band as wide as possible — for the default h = 3 that is 4
    * bands of 16 bits, i.e. 2^16 bucket values per band instead of the
    * 2^8 a fixed 8x8 layout would give. Bucket-value cardinality is the
    * scale ceiling of any banding scheme (buckets per band are bounded by
    * 2^width, so occupancy grows linearly with corpus size and in-bucket
    * pair work quadratically); maximizing width pushes that ceiling out
    * by a factor of 256 while also halving the band rows shuffled.
    * Output: (id1, id2, hamming).
    *
    * Why no DuckDB oracle (registered rows-only): the signature is built
    * from Spark's `xxhash64`, which DuckDB has no compatible
    * implementation of — the oracle cannot reproduce the signatures, and
    * every downstream number depends on them. What CAN be proven is
    * proven in LlmSpec: (a) given the signatures, the banded join equals
    * brute-force all-pairs Hamming filtering exactly (the pigeonhole is
    * lossless, not approximately-recalled), and (b) identical word
    * multisets collide at Hamming 0. The hash function itself is closed
    * by the `dedup_simhash_md5` certificate: the SAME kernel run with
    * [[md5Hash60]] — an md5-prefix word hash both engines compute
    * identically — IS oracle-green, so every component has a
    * driver-checked regime. `wordHash` must emit a non-negative value
    * (bits above its width read as 0 on both sides of every XOR, so a
    * narrower hash only makes bands less selective, never incorrect). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   wordHash: Column => Column = xxhash64(_)): DataFrame = {
    require(maxHamming <= 7, "the 8-band layout caps the guarantee at Hamming 7")
    val nBands = Seq(1, 2, 4, 8).find(_ >= maxHamming + 1).get
    val width = 64 / nBands
    def bandHash(j: Int): Column =
      if (nBands == 1) col("simhash") // h = 0: exact signature match
      else shiftright(col("simhash"), j * width)
        .bitwiseAND(lit((1L << width) - 1))
    val sigs = simhashSignatures(docs, idCol, textCol, wordHash)
    val bands = sigs.select(col("id"), col("simhash"),
      explode(array((0 until nBands).map(j =>
        struct(lit(j).as("band"), bandHash(j).as("bh"))): _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // same one-shuffle bucket kernel as candidatesFromBands (the self-join
    // formulation costs two shuffle reads of the band relation plus a
    // distinct); the signature rides in the bucket struct, so the Hamming
    // distance is computed map-side with no join back to `sigs`
    bucketPairs(bands, Seq(col("simhash")))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Portable 60-bit word hash: the first 15 hex chars of md5, as a
    * long. Not the production hash — `xxhash64` is codegen'd and
    * digest-free — but md5 is bit-identical across engines (DuckDB
    * included), which is what lets the `dedup_simhash_md5` certificate
    * oracle-check the ENTIRE simhash kernel end to end. 60 bits so the
    * value fits a signed long with no sign games; signature bits 60–63
    * are then constantly 0 on both engines (the per-bit sum over bits
    * the hash never sets is -count < 0), leaving Hamming distances
    * untouched. */
  def md5Hash60(word: Column): Column =
    conv(substring(md5(word), 1, 15), 16, 10).cast("long")
}
