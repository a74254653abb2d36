package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer partitions the corpus into `nlist` cells; a query probes
  * only its `nprobe` nearest cells with exact cosine. The second ANN
  * scale path next to sign-LSH ([[Embeddings.annLshKnn]]): at 100 TB the
  * cell assignment is a partition key, so each probe touches
  * nprobe/nlist of the data and cells can be stored as bucketed/
  * partitioned tables for cell-local scans.
  *
  * With nprobe == nlist the search is exhaustive and must equal
  * brute force exactly — the invariant IvfSpec pins.
  */
object Ivf {

  /** Fit the coarse quantizer and assign every vector to its cell.
    * Returns (assigned: id, vec, cell; centroids: cell -> center). */
  def index(emb: DataFrame, idCol: String, vecCol: String,
            nlist: Int, seed: Long = 42L): (DataFrame, Array[Array[Float]]) = {
    val feats = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .fit(feats)
    val assigned = model.transform(feats)
      .select(col("id"), col("vec"), col("prediction").as("cell"))
    (assigned, model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Top-k by exact cosine over the probed cells only. */
  def annKnn(emb: DataFrame, queryIds: Seq[Long], idCol: String, vecCol: String,
             dim: Int, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val (assigned, centers) = index(emb, idCol, vecCol, nlist)
    val v = assigned.select(col("id"), col("vec"), col("cell"),
      sqrt(Embeddings.dot("vec", "vec", dim)).as("nrm"))

    // queries with their nprobe nearest cells (centroids are tiny —
    // ranking them per query is a broadcast join, no driver loop over data)
    val centersDf = spark.createDataFrame(
        centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "center")
      .select(col("cell"), col("center").cast("array<float>").as("center"))
    val q = v.filter(col("id").isInCollection(queryIds))
      .select(col("id").as("qid"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val probed = q.crossJoin(broadcast(centersDf))
      .withColumn("cdist", Embeddings.dot("qvec", "center", dim))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cdist").desc, col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("qid"), col("qvec"), col("qnrm"), col("cell"))

    val scored = probed.join(v, Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor_id"),
        (Embeddings.dot("qvec", "vec", dim) / (col("qnrm") * col("nrm"))).as("cos"))
      // no dedup needed: every vector lives in exactly one cell and the
      // probed cells per query are distinct
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
