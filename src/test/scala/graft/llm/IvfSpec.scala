package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

class IvfSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()

  private def knnSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF with nprobe == nlist is exhaustive: equals brute force exactly") {
    val brute = knnSet(Embeddings.bruteForceKnn(emb,
      emb.filter(col("vec_id") < 6), "vec_id", "embedding", 64, 5))
    val full = knnSet(Ivf.annKnn(emb, (0L until 6L), "vec_id", "embedding",
      64, 5, nlist = 8, nprobe = 8))
    assert(full == brute)
  }

  test("partial-probe IVF trades recall for touched fraction") {
    val brute = knnSet(Embeddings.bruteForceKnn(emb,
      emb.filter(col("vec_id") < 6), "vec_id", "embedding", 64, 5))
    val partial = knnSet(Ivf.annKnn(emb, (0L until 6L), "vec_id", "embedding",
      64, 5, nlist = 8, nprobe = 4))
    val recall = (brute intersect partial).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall") // half the cells probed
    assert(partial.size == brute.size)       // still returns k per query
  }
}
