package graft.llm

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011 — public paper): split each
  * vector into `m` subvectors, k-means each subspace into `ksub`
  * centroids, store each vector as `m` small codes. At 100 TB this is THE
  * memory story for dense retrieval: a 64-dim float vector (256 bytes)
  * becomes m = 16 byte-codes (16 bytes) — 16× less shuffle and cache
  * footprint — and queries score candidates with an asymmetric-distance
  * (ADC) table of m × ksub partial distances, m table lookups per
  * candidate instead of a dim-length dot product.
  *
  * Spark shape: the codebooks are tiny (m·ksub·dsub floats) and ride to
  * executors as a broadcast; encoding and scoring are typed
  * `mapPartitions` (per-partition imperative argmin/lookup loops — the
  * case where the charter's preference order bottoms out, since a
  * per-element expression tree over m·ksub centroids would be enormous
  * and never codegen). Training samples per-subspace k-means on the ML
  * KMeans estimator. Nothing corpus-sized ever reaches the driver; the
  * query side is collected only because queries are driver-sized by
  * contract (same as the broadcast side of [[Embeddings.bruteForceKnn]]).
  *
  * Registered rows-only (approximate by construction); PqSpec pins code
  * shape, centroid round-trip, self-distance-zero on codebook-exact
  * vectors, and recall@k against exact Euclidean brute force.
  */
object Pq {

  /** codebooks(j)(c) = subspace-j centroid c (dsub floats). */
  final case class PqModel(m: Int, dsub: Int,
                           codebooks: Array[Array[Array[Float]]])

  /** Per-subspace k-means — m small ML KMeans fits over a BOUNDED
    * training sample. Quantizer training never needs the full corpus
    * (standard large-scale practice — FAISS caps training points per
    * centroid): codebook quality saturates at a few thousand points per
    * centroid, while m fits × 20 iterations over 10⁹ vectors would scan
    * the corpus hundreds of times. Corpora ≤ `maxTrain` train on every
    * row (so small/test corpora are bit-identical with or without the
    * cap); larger ones train on a seeded Bernoulli sample, persisted once
    * and shared by all m subspace fits, then unpersisted (fit is eager —
    * the KMeans fits are terminal actions). The sample is deterministic
    * for a fixed input partitioning. */
  def fit(emb: DataFrame, vecCol: String, dim: Int, m: Int,
          ksub: Int = 16, seed: Long = 42L, maxTrain: Long = 1L << 18): PqModel = {
    require(dim % m == 0, s"dim $dim must split into $m subvectors")
    val dsub = dim / m
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = emb.count()
    val train = (if (n <= maxTrain) emb.select(col(vecCol))
                 else emb.select(col(vecCol))
                   .sample(withReplacement = false, maxTrain.toDouble / n, seed))
      .persist()
    try {
      val codebooks = (0 until m).map { j =>
        val sub = train.select(array_to_vector(
          expr(s"slice($vecCol, ${j * dsub + 1}, $dsub)").cast("array<double>"))
          .as("features"))
        new KMeans().setK(ksub).setSeed(seed + j).setMaxIter(20).fit(sub)
          .clusterCenters.map(_.toArray.map(_.toFloat))
      }.toArray
      PqModel(m, dsub, codebooks)
    } finally train.unpersist()
  }

  /** Encode each vector as its per-subspace nearest-centroid indices:
    * (id, code array<int> of length m). */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             model: PqModel): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val mdl = bc.value
        it.map { case (id, v) =>
          val code = Array.tabulate(mdl.m) { j =>
            val cb = mdl.codebooks(j)
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < cb.length) {
              var s = 0.0; var t = 0
              while (t < mdl.dsub) {
                val diff = v(j * mdl.dsub + t) - cb(c)(t)
                s += diff * diff; t += 1
              }
              if (s < bestD) { bestD = s; best = c }
              c += 1
            }
            best
          }
          (id, code)
        }
      }.toDF("id", "code")
  }

  /** ADC distance table for one query: table(j)(c) = ||q_j - cb(j)(c)||². */
  private def adcTable(q: Array[Float], mdl: PqModel): Array[Array[Double]] =
    Array.tabulate(mdl.m) { j =>
      val cb = mdl.codebooks(j)
      Array.tabulate(cb.length) { c =>
        var s = 0.0; var t = 0
        while (t < mdl.dsub) {
          val diff = q(j * mdl.dsub + t) - cb(c)(t)
          s += diff * diff; t += 1
        }
        s
      }
    }

  /** Approximate top-k by ADC over the encoded corpus: for each query,
    * distance ≈ Σ_j table(j)(code(j)) — m lookups per candidate row.
    * Output: (query_id, neighbor_id, rank, adist), Euclidean semantics. */
  def adcSearch(encoded: DataFrame, model: PqModel,
                queries: Seq[(Long, Array[Float])], k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      queries.map { case (qid, q) => (qid, adcTable(q, model)) })
    val scored = encoded.select(col("id"), col("code")).as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (id, code) =>
          qs.iterator.filter(_._1 != id).map { case (qid, tab) =>
            var s = 0.0; var j = 0
            while (j < code.length) { s += tab(j)(code(j)); j += 1 }
            (qid, id, s)
          }
        }
      }.toDF("query_id", "neighbor_id", "adist")
    // bounded per-query top-k over the full scored corpus: negate the
    // distance so the descending TopK buffer ranks ascending adist (ties
    // neighbor asc — same order the row_number formulation would use,
    // without funneling n rows per query through one window-sort task)
    graft.ops.TopK.topKPerGroup(
        scored.withColumn("negd", -col("adist")),
        "query_id", "negd", "neighbor_id", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (-col("negd")).as("adist"))
  }

  /** Persist a fitted model + encoded corpus: the codebooks as a tiny
    * (j, c, center) relation, the codes as parquet — the durable form of
    * [[cachedModel]]'s session cache. At 100 TB the codes table IS the
    * compressed corpus (16×), so it is the artifact worth storing; pair
    * with [[graft.llm.IndexStore.ensure]] for crash-safe build-once. */
  def save(model: PqModel, encoded: DataFrame, path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val rows = for {
      j <- 0 until model.m
      c <- model.codebooks(j).indices
    } yield (j, c, model.codebooks(j)(c).toSeq)
    rows.toDF("j", "c", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    encoded.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Reconstruct a model from a saved (j, c, center) codebook relation —
    * shape comes from the relation itself (m = #subspaces, dsub =
    * centroid length), so saved models carry no side metadata. */
  private def readModel(spark: org.apache.spark.sql.SparkSession,
                        codebooksPath: String): PqModel = {
    val cb = spark.read.parquet(codebooksPath).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val m = cb.map(_._1).max + 1
    PqModel(m, cb.head._3.length,
      Array.tabulate(m)(j => cb.filter(_._1 == j).sortBy(_._2).map(_._3)))
  }

  /** Load a [[save]]d model + encoded corpus. */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): (PqModel, DataFrame) =
    (readModel(spark, s"$path/codebooks"), spark.read.parquet(s"$path/codes"))

  // model + encoded corpus cached per (context, corpus, m, ksub, seed) —
  // same build-once contract (and harness clearCache re-persist) as
  // Ivf.cachedIndex
  private val cache = new ConcurrentHashMap[
    (SparkContext, String, Int, Int, Long), (PqModel, DataFrame)]()

  def cachedModel(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                  m: Int, ksub: Int, seed: Long,
                  corpusKey: String): (PqModel, DataFrame) = {
    val entry = cache.computeIfAbsent(
      // Ivf.corpusId folds the plan's semantic hash into the key so two
      // corpora with the same (or defaulted) corpusKey never share a
      // codebook/code cache
      (emb.sparkSession.sparkContext, Ivf.corpusId(emb, corpusKey), m, ksub, seed), _ => {
        val mdl = fit(emb, vecCol, dim, m, ksub, seed)
        (mdl, encode(emb, idCol, vecCol, mdl).persist())
      })
    if (entry._2.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      entry._2.persist()
    lastLits = Some(litsCache.computeIfAbsent(
      (emb.sparkSession.sparkContext, Ivf.corpusId(emb, corpusKey), m, ksub, seed),
      _ => (
        entry._2.select(col("id"), col("code")).collect()
          .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq,
        (for { j <- 0 until entry._1.m
               c <- entry._1.codebooks(j).indices }
          yield (j, c, entry._1.codebooks(j)(c).toSeq)).toSeq)))
    entry
  }

  /** Run-derived oracle literals — the (id → code) table and the
    * (j, c, center) codebooks of the most recently used cached model;
    * the [[Ivf.lastLits]] contract (read at Verify's post-run oracle
    * dump). DuckDB REAL arithmetic is IEEE single precision exactly
    * like the JVM's, so the ADC table, per-candidate j-ordered distance
    * fold, shortlist tie order, and exact rerank all replay bit-exactly
    * from these literals. */
  @volatile private[graft] var lastLits
      : Option[(Seq[(Long, Seq[Int])], Seq[(Int, Int, Seq[Float])])] = None
  private val litsCache = new ConcurrentHashMap[
    (SparkContext, String, Int, Int, Long),
    (Seq[(Long, Seq[Int])], Seq[(Int, Int, Seq[Float])])]()

  /** Build-or-reuse + ADC shortlist + exact re-rank in one call (registry
    * entry point) — the standard PQ retrieval pipeline: the compressed
    * codes prune the corpus to a shortlist of `k * rerank` candidates per
    * query (m table lookups per row, 16× less data scanned), then only
    * the shortlist's full vectors are touched for exact Euclidean
    * ranking. Queries are looked up from the corpus by id (driver-sized
    * collect — the query side is small by contract). */
  def annKnn(emb: DataFrame, queryIds: Seq[Long], idCol: String,
             vecCol: String, dim: Int, k: Int, m: Int = 16, ksub: Int = 16,
             rerank: Int = 8, corpusKey: String = "default",
             seed: Long = 42L): DataFrame = {
    val (mdl, encoded) = cachedModel(emb, idCol, vecCol, dim, m, ksub, seed, corpusKey)
    val spark = emb.sparkSession
    import spark.implicits._
    val qs = emb.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(idCol).isInCollection(queryIds)) // codegen'd scan filter
      .as[(Long, Array[Float])].collect().toSeq
    val shortlist = adcSearch(encoded, mdl, qs, k * rerank)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(emb, idCol, vecCol, dim, qs, shortlist, k)
  }

  /** Exact Euclidean ranking of a (query_id, neighbor_id) shortlist:
    * touches only the shortlist's full vectors — the final stage of every
    * PQ pipeline (and the reason raw ADC ranking error doesn't surface in
    * the output: see DESIGN.md). */
  private def exactRerank(emb: DataFrame, idCol: String, vecCol: String,
                          dim: Int, qs: Seq[(Long, Array[Float])],
                          shortlist: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    val v = Embeddings.withNorm(emb, idCol, vecCol, dim)
    val qdf = broadcast(qs.toDF("qid", "qvec")
      .select(col("qid"), col("qvec"),
        sqrt(Embeddings.dot("qvec", "qvec", dim)).as("qnrm")))
    shortlist
      .join(qdf, col("query_id") === col("qid"))
      .join(v, col("neighbor_id") === col("id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("qnrm") * col("qnrm") + col("nrm") * col("nrm")
          - Embeddings.dot("qvec", "vec", dim) * 2.0d).as("dist2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("dist2"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dist2"))
  }

  // (cell, id, code) with codes CO-LOCATED with their IVF cells — joined
  // once at build time and cached, the FAISS IVFADC layout. Keyed like
  // the other caches; re-persisted after a harness clearCache.
  private val cellCodeCache = new ConcurrentHashMap[
    (SparkContext, String, Int, Int, Int, Long), DataFrame]()

  private def cachedCellCodes(index: Ivf.IvfIndex, encoded: DataFrame,
                              nlist: Int, m: Int, ksub: Int, seed: Long,
                              corpusKey: String): DataFrame = {
    val sc = encoded.sparkSession.sparkContext
    val cc = cellCodeCache.computeIfAbsent(
      (sc, Ivf.corpusId(encoded, corpusKey), nlist, m, ksub, seed), _ =>
        index.assigned.select(col("id"), col("cell"))
          .join(encoded, Seq("id"))
          .select(col("cell"), col("id"), col("code"))
          .persist())
    if (cc.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      cc.persist()
    cc
  }

  /** Save the complete IVF-ADC retrieval artifact: the coarse-quantizer
    * layout ([[Ivf.save]] — cell-partitioned), the PQ codebooks, and the
    * cell-code relation partitioned by cell. Everything a cold serving
    * session needs except the raw vectors, which stay in the source
    * table and are only touched by the exact rerank's shortlist join.
    * Wrap in [[IndexStore.ensure]] for the crash-safe build-once
    * contract (several writes → one completion marker). */
  def saveIvfAdc(index: Ivf.IvfIndex, model: PqModel, cellCodes: DataFrame,
                 path: String): Unit = {
    val spark = cellCodes.sparkSession
    import spark.implicits._
    Ivf.save(index, s"$path/ivf")
    val rows = for {
      j <- 0 until model.m
      c <- model.codebooks(j).indices
    } yield (j, c, model.codebooks(j)(c).toSeq)
    rows.toDF("j", "c", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    cellCodes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cellcodes")
  }

  /** IVF-ADC probe against a [[saveIvfAdc]]'d layout — the cold-session
    * serving path. Static pruning composes with compression here exactly
    * as the 100 TB story claims: the probed cells are collected (bounded
    * by |queries| × nprobe) and applied as PARTITION filters on the
    * cell-code scan, so only nprobe/nlist of the files are opened, and
    * those files hold 16×-compressed codes, not vectors. Output is
    * bit-identical to [[ivfAdcKnn]] with the same build (PqSpec pins it).
    * `emb` supplies query vectors and the rerank's shortlist vectors. */
  /** [[lastLits]] + the coarse layout's literals for the DISK-backed
    * composed probe, from the LOADED artifact (it may predate this
    * process): ((assignment, centroids), (codes, codebooks)). */
  @volatile private[graft] var lastDiskLits
      : Option[((Seq[(Long, Int)], Seq[(Int, Seq[Float], Double)]),
                (Seq[(Long, Seq[Int])], Seq[(Int, Int, Seq[Float])]))] = None

  def ivfAdcKnnFromDisk(emb: DataFrame, path: String, queryIds: Seq[Long],
                        idCol: String, vecCol: String, dim: Int, k: Int,
                        nprobe: Int, rerank: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val index = Ivf.load(spark, s"$path/ivf")
    val mdl = readModel(spark, s"$path/codebooks")
    lastDiskLits = Some((
      (index.assigned.select(col("id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq,
        index.centroids.collect()
          .map(r => (r.getInt(0), r.getSeq[Float](1), r.getDouble(2)))
          .sortBy(_._1).toSeq),
      (spark.read.parquet(s"$path/cellcodes")
        .select(col("id"), col("code")).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq,
        (for { j <- 0 until mdl.m; c <- mdl.codebooks(j).indices }
          yield (j, c, mdl.codebooks(j)(c).toSeq)).toSeq)))
    val qs = emb.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(idCol).isInCollection(queryIds))
      .as[(Long, Array[Float])].collect().toSeq
    val bc = spark.sparkContext.broadcast(
      qs.map { case (qid, q) => (qid, adcTable(q, mdl)) }.toMap)
    val probes = Ivf.probeCells(index, queryIds, dim, nprobe)
      .select(col("qid"), col("cell")).persist()
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val prunedCodes = spark.read.parquet(s"$path/cellcodes")
      .filter(col("cell").isInCollection(cells)) // PartitionFilters on the layout
    val scored = broadcast(probes).join(prunedCodes, Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("code"))
      .as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val qt = bc.value
        it.map { case (qid, id, code) =>
          var s = 0.0; var j = 0
          while (j < code.length) { s += qt(qid)(j)(code(j)); j += 1 }
          (qid, id, s)
        }
      }.toDF("query_id", "neighbor_id", "adist")
    val shortlist = graft.ops.TopK.topKPerGroup(
        scored.withColumn("negd", -col("adist")),
        "query_id", "negd", "neighbor_id", k * rerank)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(emb, idCol, vecCol, dim, qs, shortlist, k)
  }

  /** Build-or-load + cold probe in one registry-callable step — the
    * IVF-ADC sibling of [[Ivf.annKnnFromDisk]]: first use of this data
    * builds and [[saveIvfAdc]]s (marker-gated), every call answers from
    * the loaded layout. */
  def ivfAdcKnnDisk(emb: DataFrame, dataPath: String, queryIds: Seq[Long],
                    idCol: String, vecCol: String, dim: Int, k: Int,
                    nlist: Int, nprobe: Int, m: Int = 16, ksub: Int = 16,
                    rerank: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    val dir = IndexStore.indexDir(spark, s"ivfadc${nlist}_${m}_${ksub}_$seed", dataPath)
    IndexStore.ensure(spark, dir) {
      val index = Ivf.build(emb, idCol, vecCol, dim, nlist, seed)
      val mdl = fit(emb, vecCol, dim, m, ksub, seed)
      val encoded = encode(emb, idCol, vecCol, mdl)
      val cellCodes = index.assigned.select(col("id"), col("cell"))
        .join(encoded, Seq("id"))
        .select(col("cell"), col("id"), col("code"))
      saveIvfAdc(index, mdl, cellCodes, dir)
      index.assigned.unpersist()
    }
    ivfAdcKnnFromDisk(emb, dir, queryIds, idCol, vecCol, dim, k, nprobe, rerank)
  }

  /** IVF-ADC (the paper's full system): the IVF coarse quantizer prunes
    * the corpus to `nprobe`/`nlist` of its cells, ADC scores only those
    * cells' codes, and the shortlist is exact-reranked. At 100 TB the two
    * prunings compose: a probe reads nprobe/nlist of the files
    * (cell-partitioned layout, see [[Ivf.save]]) and scans them at 16×
    * compression. With nprobe == nlist this equals [[annKnn]] exactly —
    * the cells partition the corpus, so probing all of them is the plain
    * PQ scan (PqSpec pins it).
    *
    * The codes are joined to their cells ONCE, at build time
    * ([[cachedCellCodes]]): the query path is then a broadcast of the
    * tiny (qid, cell) probe list against the cached cell-code layout —
    * no corpus-sized shuffle per call. (Joining `encoded` by id at query
    * time would re-shuffle every code row on every invocation.) */
  def ivfAdcKnn(emb: DataFrame, queryIds: Seq[Long], idCol: String,
                vecCol: String, dim: Int, k: Int, nlist: Int, nprobe: Int,
                m: Int = 16, ksub: Int = 16, rerank: Int = 8,
                corpusKey: String = "default", seed: Long = 42L): DataFrame = {
    val index = Ivf.cachedIndex(emb, idCol, vecCol, dim, nlist, seed, corpusKey)
    val (mdl, encoded) = cachedModel(emb, idCol, vecCol, dim, m, ksub, seed, corpusKey)
    val cellCodes = cachedCellCodes(index, encoded, nlist, m, ksub, seed, corpusKey)
    val spark = emb.sparkSession
    import spark.implicits._
    val qs = emb.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(idCol).isInCollection(queryIds)) // codegen'd scan filter
      .as[(Long, Array[Float])].collect().toSeq
    val bc = spark.sparkContext.broadcast(
      qs.map { case (qid, q) => (qid, adcTable(q, mdl)) }.toMap)
    val probes = Ivf.probeCells(index, queryIds, dim, nprobe)
      .select(col("qid"), col("cell")) // |queries| × nprobe rows — bounded
    val scored = broadcast(probes).join(cellCodes, Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("code"))
      .as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val qt = bc.value
        it.map { case (qid, id, code) =>
          val tab = qt(qid)
          var s = 0.0; var j = 0
          while (j < code.length) { s += tab(j)(code(j)); j += 1 }
          (qid, id, s)
        }
      }.toDF("query_id", "neighbor_id", "adist")
    // bounded shortlist selection, same tie order as adcSearch
    val shortlist = graft.ops.TopK.topKPerGroup(
        scored.withColumn("negd", -col("adist")),
        "query_id", "negd", "neighbor_id", k * rerank)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(emb, idCol, vecCol, dim, qs, shortlist, k)
  }
}
