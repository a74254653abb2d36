package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for bounded BFS hop distances: equality with a sequential BFS,
  * the hop bound, source precedence, directedness, and partitioning
  * invariance. */
class GraphPathsSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], sources: Set[Long],
                        maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    (1 to maxHops).foreach { h =>
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> h.toLong)
    }
    dist
  }

  test("matches sequential BFS on random directed graphs, several depths") {
    val rnd = new scala.util.Random(71)
    val edges = (1 to 500).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    val sources = Set(0L, 1L, 2L)
    Seq(1, 3, 6).foreach { k =>
      val got = GraphPaths.shortestHops(edges.toDF("s", "t"), "s", "t",
          sources.toSeq.toDF("n"), "n", k)
        .as[(Long, Long)].collect().toMap
      assert(got === reference(edges, sources, k), s"maxHops=$k")
    }
  }

  test("hop bound respected: a long chain is cut at maxHops") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    val got = GraphPaths.shortestHops(chain.toDF("s", "t"), "s", "t",
        Seq(0L).toDF("n"), "n", 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("a source stays at distance 0 even when reachable from another source") {
    val got = GraphPaths.shortestHops(Seq((1L, 2L)).toDF("s", "t"), "s", "t",
        Seq(1L, 2L).toDF("n"), "n", 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("edges are directed: reverse reachability requires symmetrization") {
    val e = Seq((5L, 6L))
    val fwd = GraphPaths.shortestHops(e.toDF("s", "t"), "s", "t",
        Seq(6L).toDF("n"), "n", 2)
      .as[(Long, Long)].collect().toMap
    assert(fwd === Map(6L -> 0L)) // 5 unreachable going forward from 6
    val sym = e ++ e.map(_.swap)
    val both = GraphPaths.shortestHops(sym.toDF("s", "t"), "s", "t",
        Seq(6L).toDF("n"), "n", 2)
      .as[(Long, Long)].collect().toMap
    assert(both === Map(6L -> 0L, 5L -> 1L))
  }

  test("result is invariant under repartitioning") {
    val rnd = new scala.util.Random(73)
    val edges = (1 to 800).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    def run(parts: Int) =
      GraphPaths.shortestHops(edges.toDF("s", "t").repartition(parts), "s", "t",
          Seq(0L, 5L).toDF("n"), "n", 4)
        .as[(Long, Long)].collect().toSet
    assert(run(3) === run(23))
  }
}
