package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for integer fixed-point PageRank: bit-equality with a sequential
  * driver-side reference of the identical recurrence, partitioning
  * invariance (the property the integer formulation buys), and dangling /
  * source-node edge semantics.
  */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Sequential reference: the same recurrence, same integer ops. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = 1000000L): Map[Long, Long] = {
    val dedup = edges.distinct
    val nodes = (dedup.map(_._1) ++ dedup.map(_._2)).distinct
    val outdeg = dedup.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val teleport = 15L * scale / 100L
    var pr = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val contribs = dedup.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => pr(s) / outdeg(s) }.sum
      }
      pr = nodes.map(n => n -> (teleport + 85L * contribs.getOrElse(n, 0L) / 100L)).toMap
    }
    pr
  }

  test("matches the sequential reference on a random graph, several iteration counts") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = edges.toDF("src", "dst")
    Seq(1, 3, 5).foreach { iters =>
      val got = PageRank.ranks(df, "src", "dst", iters)
        .as[(Long, Long)].collect().toMap
      assert(got === reference(edges, iters), s"iters=$iters")
    }
  }

  test("result is bit-identical under repartitioning") {
    val rnd = new scala.util.Random(43)
    val edges = (1 to 600).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    def run(parts: Int) =
      PageRank.ranks(edges.toDF("src", "dst").repartition(parts), "src", "dst", 3)
        .as[(Long, Long)].collect().toMap
    assert(run(2) === run(17))
  }

  test("dangling sink keeps collecting; pure source decays to teleport fixpoint") {
    // 1 -> 2 -> 3; 3 dangles (mass leaks), 1 has no inbound
    val df = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = PageRank.ranks(df, "src", "dst", 2).as[(Long, Long)].collect().toMap
    // reference by hand, scale 1e6: r0 = 1e6 each
    // iter1: n1 = 150000; n2 = 150000 + 850000 = 1000000; n3 same
    // iter2: n1 = 150000; n2 = 150000 + 85*150000/100 = 277500
    //        n3 = 150000 + 850000 = 1000000
    assert(pr === Map(1L -> 150000L, 2L -> 277500L, 3L -> 1000000L))
  }

  test("duplicate edge rows collapse: multigraph input ranks like its simple graph") {
    val simple = Seq((1L, 2L), (2L, 1L), (1L, 3L))
    val multi = simple ++ simple ++ simple.take(1)
    val a = PageRank.ranks(simple.toDF("src", "dst"), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.ranks(multi.toDF("src", "dst"), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
