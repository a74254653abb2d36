package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for bounded k-core peeling: fixpoint equality with a sequential
  * peeler, the cascade behavior the round bound truncates, closed forms
  * (clique survives, tree dissolves), and partitioning invariance. */
class GraphCoresSpec extends SparkTestBase {
  import spark.implicits._

  /** Sequential peel to fixpoint; returns surviving (node -> degree). */
  private def reference(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct
    var changed = true
    while (changed) {
      val deg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
        .map { case (n, l) => n -> l.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(p => keep(p._1) && keep(p._2))
      changed = next.size != es.size
      es = next
    }
    (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
      .map { case (n, l) => n -> l.size.toLong }
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    GraphCores.kCoreNodes(edges.toDF("s", "t"), "s", "t", k, rounds)
      .as[(Long, Long)].collect().toMap

  test("converges to the sequential fixpoint on random graphs (rounds >= cascade depth)") {
    val rnd = new scala.util.Random(83)
    (1 to 3).foreach { trial =>
      val edges = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      Seq(3, 5, 8).foreach { k =>
        assert(run(edges, k, rounds = 20) === reference(edges, k),
          s"trial $trial k=$k")
      }
    }
  }

  test("closed forms: a K5 clique is its own 4-core; a long path has an empty 2-core") {
    val k5 = for { i <- 0L until 5L; j <- i + 1 until 5L } yield (i, j)
    assert(run(k5, 4, 3) === (0L until 5L).map(_ -> 4L).toMap)
    val path = (0L until 30L).map(i => (i, i + 1))
    assert(run(path, 2, 40) === Map.empty)
  }

  test("the round bound truncates the cascade exactly one layer per round") {
    // path 0-1-2-3-4-5: peeling at k=2 eats one endpoint layer per round
    val path = (0L until 6L).map(i => (i, i + 1))
    val after1 = run(path, 2, 1)
    // endpoints 0 and 6 drop in round 1 -> edges 1..5 remain
    assert(after1.keySet === (1L to 5L).toSet)
    val after2 = run(path, 2, 2)
    assert(after2.keySet === (2L to 4L).toSet)
  }

  test("result is invariant under repartitioning") {
    val rnd = new scala.util.Random(89)
    val edges = (1 to 700).map(_ => (rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
    def go(parts: Int) =
      GraphCores.kCoreNodes(edges.toDF("s", "t").repartition(parts), "s", "t", 4, 15)
        .as[(Long, Long)].collect().toSet
    assert(go(2) === go(21))
  }
}
