package graft.llm

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer partitions the corpus into `nlist` cells; a query probes
  * only its `nprobe` nearest cells with exact cosine. The second ANN
  * scale path next to sign-LSH ([[Embeddings.annLshKnn]]): at 100 TB the
  * cell assignment is a partition key, so each probe touches
  * nprobe/nlist of the data and cells can be stored as bucketed/
  * partitioned tables for cell-local scans.
  *
  * Build and probe are SPLIT: [[build]] fits the quantizer once and
  * persists the cell-partitioned assignment; [[probe]] is the query
  * path and never re-fits. Probe cells are ranked by SQUARED EUCLIDEAN
  * distance to the centroid — the same metric KMeans assigns by. Ranking
  * them by raw dot product (the obvious shortcut) disagrees with the
  * assignment for non-normalized vectors: a far centroid with a large
  * norm can out-dot the query's own cell, so the query's best matches —
  * which live in its assigned cell — are never probed and recall
  * silently degrades at nprobe < nlist (IvfSpec pins top-1 probe ==
  * assigned cell to keep this from regressing).
  *
  * With nprobe == nlist the search is exhaustive and must equal
  * brute force exactly — the invariant IvfSpec pins.
  */
object Ivf {

  /** A built IVF index: `assigned` is (id, vec, nrm, cell) hash-
    * partitioned by cell and persisted (at 100 TB: a table bucketed or
    * partitioned by cell, so a probe scans only its cells' files);
    * `centroids` is the tiny (cell, center, cnorm2) broadcast side. */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Fit the coarse quantizer ONCE and materialize the cell layout.
    * The k-means TRAINS on a bounded sample (≤ `maxTrain` rows — see
    * [[Pq.fit]] for why quantizer training never needs the full corpus;
    * corpora under the cap train on every row, so test-scale results are
    * unchanged) but ASSIGNS every corpus row to its cell. */
  def build(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
            nlist: Int, seed: Long = 42L, maxTrain: Long = 1L << 18): IvfIndex = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val feats = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      array_to_vector(col(vecCol)).as("features"))
    val n = emb.count()
    val train = (if (n <= maxTrain) feats.select(col("features"))
                 else feats.select(col("features"))
                   .sample(withReplacement = false, maxTrain.toDouble / n, seed))
      .persist()
    val model = try new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .fit(train) finally train.unpersist()
    val assigned = model.transform(feats)
      .select(col("id"), col("vec"), col("prediction").as("cell"),
        sqrt(Embeddings.dot("vec", "vec", dim)).as("nrm"))
      .repartition(col("cell"))
      .persist()
    val centers = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val centroids = spark.createDataFrame(
        centers.zipWithIndex.map { case (c, i) =>
          (i, c.toSeq, c.map(x => x.toDouble * x.toDouble).sum)
        })
      .toDF("cell", "center", "cnorm2")
      .select(col("cell"), col("center").cast("array<float>").as("center"),
        col("cnorm2"))
    IvfIndex(assigned, centroids)
  }

  // One index per (context, corpus key, nlist, seed): registry and bench
  // invocations after the first are probe-only, which is the honest cost
  // of the operator (the index is a build-once artifact, not query work).
  private val cache =
    new ConcurrentHashMap[(SparkContext, String, Int, Long), IvfIndex]()

  /** Cache discriminator: the user's corpusKey PLUS the input plan's
    * semantic hash — two different corpora passed with the same (or
    * defaulted) corpusKey must not share an index, or the second call
    * would silently probe the first corpus's cells. Same source + same
    * transformations → same hash, so legitimate reuse still hits. */
  private[llm] def corpusId(df: DataFrame, key: String): String =
    s"$key#${df.queryExecution.analyzed.semanticHash()}"

  /** Run-derived oracle literals for the driver's DuckDB replay: the
    * (id → cell) assignment and (cell, center, cnorm2) centroid rows of
    * the most recently built cached index. `SparkEntry.registry` is a
    * `def`, re-evaluated when Verify dumps `oracle_sql.json` AFTER every
    * query ran — so the oracle builders (LlmQueries `dedupSemanticSql` /
    * `knnAnnIvfSql`) see exactly the index those queries probed, and
    * everything DOWNSTREAM of the MLlib cell assignment — probe-cell
    * ranking, within-cell candidate generation, the cosine fold, top-k
    * tie order — replays bit-exactly in SQL (the `graft_dot` ==
    * left-to-right `list_reduce` contract). The assignment itself is the
    * one inlined fact, O(corpus ids) literals; the quantizer's training
    * is certified separately (IvfSpec: exhaustive probe == brute force,
    * which the driver ALSO hash-checks via knn_ann_ivf_exh). */
  @volatile private[graft] var lastLits
      : Option[(Seq[(Long, Int)], Seq[(Int, Seq[Float], Double)])] = None
  private val litsCache = new ConcurrentHashMap[
    (SparkContext, String, Int, Long),
    (Seq[(Long, Int)], Seq[(Int, Seq[Float], Double)])]()

  def cachedIndex(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                  nlist: Int, seed: Long, corpusKey: String): IvfIndex = {
    val key = (emb.sparkSession.sparkContext, corpusId(emb, corpusKey),
      nlist, seed)
    val idx = cache.computeIfAbsent(key,
      _ => build(emb, idCol, vecCol, dim, nlist, seed))
    // a harness-level spark.catalog.clearCache() (Verify/Bench run one
    // between queries) unpersists the assignment behind our back; without
    // this re-persist, later probes silently re-run model.transform per
    // call and the "repeat calls are probe-only" contract is false
    if (idx.assigned.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      idx.assigned.persist()
    lastLits = Some(litsCache.computeIfAbsent(key, _ => (
      idx.assigned.select(col("id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq,
      idx.centroids.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1).toSeq)))
    idx
  }

  /** Top-k by exact cosine over the probed cells only — no fitting here. */
  def probe(index: IvfIndex, queryIds: Seq[Long], dim: Int, k: Int,
            nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = index.assigned
    // queries with their nprobe nearest cells by squared Euclidean
    // ||q - c||^2 = |q|^2 - 2<q,c> + |c|^2 (centroids are tiny — ranking
    // them per query is a broadcast join, no driver loop over data)
    val q = v.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val probed = q.crossJoin(broadcast(index.centroids))
      .withColumn("cdist2",
        col("qnrm") * col("qnrm")
          - Embeddings.dot("qvec", "center", dim) * 2.0d + col("cnorm2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cdist2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("qid"), col("qvec"), col("qnrm"), col("cell"))

    val scored = probed.join(v, Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor_id"),
        (Embeddings.dot("qvec", "vec", dim) / (col("qnrm") * col("nrm"))).as("cos"))
      // no dedup needed: every vector lives in exactly one cell and the
      // probed cells per query are distinct
    // bounded per-query top-k: the probed cells hold nprobe/nlist of the
    // corpus, so a row_number window here would sort that whole fraction
    // in one task per query; the TopK aggregator keeps O(k) state with
    // map-side partial merge (same tie order: cos desc, neighbor asc)
    graft.ops.TopK.topKPerGroup(scored, "qid", "cos", "neighbor_id", k)
      .select(col("qid").as("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** The pruned corpus scan [[probeFromDisk]] performs — exposed so
    * IvfSpec can pin that on the saved cell-partitioned layout this is a
    * PARTITION filter (file-level pruning), not a post-scan row filter. */
  def prunedScan(index: IvfIndex, cells: Seq[Int]): DataFrame =
    index.assigned.filter(col("cell").isInCollection(cells))

  /** [[probe]] for a DISK-BACKED index (see [[save]]/[[load]]), with
    * STATIC partition pruning: the probed cells are ranked first, the
    * distinct cell ids collected (bounded by |queries| × nprobe), and
    * applied as an `isInCollection` filter on the partition column — so
    * the corpus scan opens only the probed cells' files instead of
    * reading everything and filtering after ([[probe]]'s equi-join prunes
    * nothing on a cold parquet scan without DPP kicking in). Joining the
    * per-query probe list back on `cell` afterwards restricts each query
    * to ITS cells, so the output is bit-identical to [[probe]]. */
  def probeFromDisk(index: IvfIndex, queryIds: Seq[Long], dim: Int, k: Int,
                    nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = index.assigned.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val probed = q.crossJoin(broadcast(index.centroids))
      .withColumn("cdist2",
        col("qnrm") * col("qnrm")
          - Embeddings.dot("qvec", "center", dim) * 2.0d + col("cnorm2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cdist2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("qid"), col("qvec"), col("qnrm"), col("cell"))
      .persist() // read twice: cell-list collect + the bucket join; tiny
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val scored = broadcast(probed).join(prunedScan(index, cells), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor_id"),
        (Embeddings.dot("qvec", "vec", dim) / (col("qnrm") * col("nrm"))).as("cos"))
    graft.ops.TopK.topKPerGroup(scored, "qid", "cos", "neighbor_id", k)
      .select(col("qid").as("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Full disk lifecycle in one registry-callable step: build + [[save]]
    * on first use of this data (guarded by [[IndexStore.ensure]]'s
    * completion marker), then answer from a COLD [[load]] — the path a
    * fresh session takes, proving queries never rebuild. `dataPath` is
    * the SOURCE data location; the index directory is derived from its
    * content fingerprint, so regenerated data gets a fresh index. */
  def annKnnFromDisk(emb: DataFrame, dataPath: String, queryIds: Seq[Long],
                     idCol: String, vecCol: String, dim: Int, k: Int,
                     nlist: Int, nprobe: Int, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark) // graft_dot for the probe
    val dir = IndexStore.indexDir(spark, s"ivf${nlist}_$seed", dataPath)
    IndexStore.ensure(spark, dir) {
      val idx = build(emb, idCol, vecCol, dim, nlist, seed)
      save(idx, dir)
      idx.assigned.unpersist()
    }
    val loaded = load(spark, dir)
    // oracle literals from the LOADED artifact (it may predate this
    // process — the in-memory index's assignment is not authoritative
    // for the disk probe); same replay contract as lastLits
    lastDiskLits = Some((
      loaded.assigned.select(col("id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq,
      loaded.centroids.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1).toSeq))
    probeFromDisk(loaded, queryIds, dim, k, nprobe)
  }

  /** [[lastLits]] for the disk-backed probe's own saved artifact. */
  @volatile private[graft] var lastDiskLits
      : Option[(Seq[(Long, Int)], Seq[(Int, Seq[Float], Double)])] = None

  /** The nprobe nearest cells per query (build-metric ranking) — exposed
    * for the IvfSpec pin that the top-1 probe is the assigned cell. */
  def probeCells(index: IvfIndex, queryIds: Seq[Long], dim: Int,
                 nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    index.assigned.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("nrm").as("qnrm"), col("cell").as("assigned_cell"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("cdist2",
        col("qnrm") * col("qnrm")
          - Embeddings.dot("qvec", "center", dim) * 2.0d + col("cnorm2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cdist2"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("qid"), col("assigned_cell"), col("cell"), col("crk"))
  }

  /** Assign a NEW batch of vectors to an existing index's cells WITHOUT
    * refitting the quantizer — the ingest path of an index maintained
    * across corpus versions (the vector-side sibling of
    * [[TextDedup.incrementalMinhashLsh]]). Centroids are collected
    * (nlist rows — the same driver-side footprint the KMeans model
    * itself has) and inlined as literals, so assignment is MAP-ONLY: no
    * shuffle until the final repartition co-locates new rows with their
    * cell. Argmin tie-break matches [[probe]]'s cell ranking (cdist2,
    * then cell id). The centroids do not move — quantizer drift is the
    * caller's rebuild decision, the standard IVF maintenance contract. */
  def ingest(index: IvfIndex, newEmb: DataFrame, idCol: String,
             vecCol: String, dim: Int): IvfIndex = {
    graft.functions.GraftFunctions.register(newEmb.sparkSession)
    val cents = index.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val scored = cents.map { case (cell, center, cnorm2) =>
      struct(
        (col("nrm") * col("nrm")
          - call_function("graft_dot", col("vec"), typedLit(center)) * 2.0d
          + lit(cnorm2)).as("d"),
        lit(cell).as("cell"))
    }
    val withCell = Embeddings.withNorm(newEmb, idCol, vecCol, dim)
      .withColumn("best", array_min(array(scored.toIndexedSeq: _*)))
      .select(col("id"), col("vec"), col("best.cell").as("cell"), col("nrm"))
    IvfIndex(index.assigned.unionByName(withCell.repartition(col("cell"))),
      index.centroids)
  }

  /** Persist the index as a cell-PARTITIONED parquet table — the 100 TB
    * layout: a probe's cell filter becomes a partition filter, so only
    * nprobe/nlist of the files are ever opened (IvfSpec pins
    * PartitionFilters in the scan). */
  def save(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(spark.read.parquet(s"$path/assigned"),
      spark.read.parquet(s"$path/centroids"))

  /** Build-or-reuse + probe in one call (registry entry point). */
  def annKnn(emb: DataFrame, queryIds: Seq[Long], idCol: String, vecCol: String,
             dim: Int, k: Int, nlist: Int, nprobe: Int,
             corpusKey: String = "default", seed: Long = 42L): DataFrame =
    probe(cachedIndex(emb, idCol, vecCol, dim, nlist, seed, corpusKey),
      queryIds, dim, k, nprobe)
}
