package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Cluster-balanced sampling ([[Embeddings.clusterBalancedSample]])
  * contracts: assignment goes to the nearest anchor by exact cosine,
  * no cluster exceeds the cap, small clusters survive whole (balance —
  * the point of the operator), the hash priority makes the sample
  * deterministic and partitioning-independent, and the anchor set is the
  * k smallest ids. */
class ClusterSampleSpec extends SparkTestBase {

  private val dim = 8

  /** 4 well-separated direction groups of very different sizes:
    * group g = axis-aligned unit-ish vectors around axis g.
    * ids encode the group: id % 4 == g. Sizes: g0=40, g1=20, g2=8, g3=4. */
  private def grouped(): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val sizes = Seq(40, 20, 8, 4)
    val rows = for {
      g <- 0 until 4
      j <- 0 until sizes(g)
    } yield {
      val v = Array.fill(dim)(0.05f * rnd.nextGaussian().toFloat)
      v(g) += 1.0f
      ((j * 4 + g).toLong, unit(v))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("balance: per-cluster cap holds, small clusters survive whole") {
    val out = Embeddings.clusterBalancedSample(grouped(), "vec_id",
      "embedding", dim, k = 4, perCluster = 10).cache()
    val byCluster = out.groupBy("cluster").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCluster.values.forall(_ <= 10L), byCluster.toString)
    // anchors are the 4 smallest ids: 0,1,2,3 — one per group, so each
    // group IS a cluster; the 8- and 4-member groups survive whole
    assert(byCluster.keySet == Set(0L, 1L, 2L, 3L))
    assert(byCluster(2L) == 8L && byCluster(3L) == 4L)
    assert(byCluster(0L) == 10L && byCluster(1L) == 10L)
    // every sampled member belongs to its cluster's group
    val wrong = out.filter(col("vec_id") % 4 =!= col("cluster")).count()
    assert(wrong == 0L, "assignment must pick the nearest anchor")
  }

  test("deterministic and partitioning-independent") {
    val base = grouped()
    val a = Embeddings.clusterBalancedSample(base.repartition(1), "vec_id",
      "embedding", dim, k = 4, perCluster = 5)
      .collect().map(_.toSeq).toSet
    val b = Embeddings.clusterBalancedSample(base.repartition(13), "vec_id",
      "embedding", dim, k = 4, perCluster = 5)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // min(groupSize, perCluster) summed: 5 + 5 + 5 + 4 (group 3 has 4)
    assert(a.size == 19)
  }

  test("ranks are 1..n per cluster and priorities descend with rank") {
    val out = Embeddings.clusterBalancedSample(grouped(), "vec_id",
      "embedding", dim, k = 4, perCluster = 6)
    val perCluster = out.collect()
      .groupBy(_.getLong(0)).values
    perCluster.foreach { rows =>
      val ranks = rows.map(_.getInt(2)).sorted.toSeq
      assert(ranks == (1 to rows.length).toSeq)
      val byRank = rows.sortBy(_.getInt(2))
        .map(r => (r.getLong(1) * 2654435761L) % 1000000007L).toSeq
      assert(byRank == byRank.sorted(Ordering[Long].reverse),
        "hash priority must descend with rank")
    }
  }
}
