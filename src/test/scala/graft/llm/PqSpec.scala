package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** Product-quantization properties: code shape/compression, exact
  * round-trip on codebook-composed vectors, and ADC recall against exact
  * Euclidean brute force (why rows-only: ADC distances depend on the
  * KMeans codebooks, which no SQL oracle can reproduce). */
class PqSpec extends SparkTestBase {

  private val dim = 64
  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val model = Pq.fit(emb, "embedding", dim, m = 16, ksub = 16)

  test("codes: length m, every entry a valid centroid index") {
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
      .select("code").collect().map(_.getSeq[Int](0))
    assert(codes.nonEmpty)
    assert(codes.forall(_.length == 16))          // 256-byte float vector -> 16 codes
    assert(codes.forall(_.forall(c => c >= 0 && c < 16)))
  }

  test("codebook-composed vector round-trips: encode returns its indices, ADC self-distance 0") {
    import spark.implicits._
    val picked = (0 until 16).map(j => (j * 5 + 3) % 16)
    val v = picked.zipWithIndex.flatMap { case (c, j) =>
      model.codebooks(j)(c).toSeq }.toArray
    val df = Seq((1000L, v)).toDF("vec_id", "embedding")
    val code = Pq.encode(df, "vec_id", "embedding", model)
      .select("code").collect().head.getSeq[Int](0)
    assert(code.toList == picked.toList)
    // a corpus row with the exact same composed vector scores adist 0
    val hit = Pq.adcSearch(Pq.encode(df, "vec_id", "embedding", model),
      model, Seq((2000L, v)), k = 1).collect().head
    assert(hit.getAs[Long]("neighbor_id") == 1000L)
    assert(hit.getAs[Double]("adist") == 0.0)
  }

  test("fit trains on a bounded sample when the corpus exceeds maxTrain; codes cover the full corpus") {
    val mdl = Pq.fit(emb, "embedding", dim, m = 8, ksub = 8, maxTrain = 64L)
    assert(mdl.codebooks.length == 8 && mdl.codebooks.forall(_.length == 8))
    val codes = Pq.encode(emb, "vec_id", "embedding", mdl)
    assert(codes.count() == emb.count()) // every row encoded, sampled or not
    assert(codes.select("code").collect()
      .forall(_.getSeq[Int](0).forall(c => c >= 0 && c < 8)))
  }

  test("IVF-ADC with nprobe == nlist equals the plain PQ scan exactly") {
    // the cells partition the corpus: probing all of them is the full
    // scan, so the composed pipeline must reproduce annKnn bit-for-bit
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val plain = key(Pq.annKnn(emb, (0L until 6L), "vec_id", "embedding",
      dim, k = 5, m = 16, ksub = 16, corpusKey = "pqspec"))
    val composed = key(Pq.ivfAdcKnn(emb, (0L until 6L), "vec_id", "embedding",
      dim, k = 5, nlist = 8, nprobe = 8, m = 16, ksub = 16, corpusKey = "pqspec"))
    assert(composed == plain)
    assert(plain.nonEmpty)
  }

  test("IVF-ADC partial probe still returns k per query") {
    val partial = Pq.ivfAdcKnn(emb, (0L until 6L), "vec_id", "embedding",
      dim, k = 5, nlist = 8, nprobe = 4, m = 16, ksub = 16, corpusKey = "pqspec")
      .collect().groupBy(_.getLong(0))
    assert(partial.size == 6 && partial.values.forall(_.length == 5))
  }

  test("ADC-shortlist + exact-rerank recall@5 vs exact Euclidean brute force") {
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = all.filter(_._1 < 8)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val exact = queries.map { case (qid, q) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, v) => (id, d2(q, v)) }
        .sortBy { case (id, dd) => (dd, id) }.take(5).map(_._1).toSet
    }.toMap
    val approx = Pq.annKnn(emb, (0L until 8L), "vec_id", "embedding",
        dim, k = 5, m = 16, ksub = 16, corpusKey = "pqspec")
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) intersect approx(q)).size.toDouble / exact(q).size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean ADC recall@5 $mean (per-query: $recalls)")
  }

  test("save/load round-trips the model and codes; loaded ADC search is identical") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    val encoded = Pq.encode(emb, "vec_id", "embedding", model)
    Pq.save(model, encoded, dir)
    val (mdl2, codes2) = Pq.load(spark, dir)
    assert(mdl2.m == model.m && mdl2.dsub == model.dsub)
    for (j <- 0 until model.m; c <- model.codebooks(j).indices)
      assert(mdl2.codebooks(j)(c).sameElements(model.codebooks(j)(c)), s"cb($j)($c)")
    val qs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .filter(col("vec_id") < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(key(Pq.adcSearch(codes2, mdl2, qs, k = 5)) ==
      key(Pq.adcSearch(encoded, model, qs, k = 5)))
  }

  test("IVF-ADC disk lifecycle: cold probe equals the in-memory composed pipeline") {
    val dataPath = s"$sf0001/embeddings.parquet"
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val disk = key(Pq.ivfAdcKnnDisk(emb, dataPath, (0L until 6L),
      "vec_id", "embedding", dim, k = 5, nlist = 8, nprobe = 4))
    val mem = key(Pq.ivfAdcKnn(emb, (0L until 6L), "vec_id", "embedding",
      dim, k = 5, nlist = 8, nprobe = 4, m = 16, ksub = 16, corpusKey = "pqspec"))
    assert(disk == mem)
    assert(disk.nonEmpty)
    // the saved cell-code layout turns probed cells into PARTITION filters
    val dir = IndexStore.indexDir(spark, "ivfadc8_16_16_42", dataPath)
    val explained = spark.read.parquet(s"$dir/cellcodes")
      .filter(col("cell").isInCollection(Seq(1, 3))).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(explained.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      explained)
    // marker present → a second call must not rebuild
    assert(!IndexStore.ensure(spark, dir) { fail("rebuilt despite marker") })
  }

  test("defaulted corpusKey cannot alias two different corpora") {
    // the cache folds the input plan's semantic hash into its key, so
    // back-to-back calls over DIFFERENT corpora with the default key
    // must not share codebooks/codes — neighbors must come from the
    // corpus actually queried
    val corpusA = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 300)
    val corpusB = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 300)
    Pq.annKnn(corpusA, (0L until 4L), "vec_id", "embedding", dim, k = 3,
      m = 16, ksub = 16)
    val idsB = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 300)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bQueries = idsB.toSeq.sorted.take(4)
    val neighbors = Pq.annKnn(corpusB, bQueries, "vec_id", "embedding", dim,
        k = 3, m = 16, ksub = 16)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(neighbors.subsetOf(idsB),
      s"neighbors leaked from the other corpus: ${neighbors -- idsB}")
  }
}
