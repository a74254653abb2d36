package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for bounded min-label propagation: equality with the CONVERGENT
  * dedup-pipeline components (transferring the registry oracle's
  * certificate to the production path), closed forms, the one-hop-per-
  * round bound, and bit-equality across the checkpoint policies. */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)], rounds: Int,
                     dir: Option[String] = None): Map[Long, Long] =
    Components.labelsBounded(edges.toDF("s", "t"), "s", "t", rounds, dir)
      .as[(Long, Long)].collect().toMap

  test("bounded labels equal the convergent pipeline's components once rounds cover the diameter") {
    val rnd = new scala.util.Random(19)
    (1 to 3).foreach { trial =>
      val edges = (1 to 150).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(p => p._1 != p._2)
      val bounded = labels(edges, rounds = 40)
      val pairs = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
        .distinct.toDF("id1", "id2")
      val convergent = graft.llm.DedupPipeline.components(pairs, maxIters = 60)
        .as[(Long, Long)].collect().toMap
      assert(bounded === convergent, s"trial $trial")
    }
  }

  test("closed forms: a path collapses to its minimum; disjoint cliques stay separate") {
    val path = (0L until 10L).map(i => (i, i + 1))
    assert(labels(path, rounds = 10).values.toSet === Set(0L))
    val cliques = (for { c <- 0L until 3L; i <- 0L until 4L; j <- i + 1 until 4L }
      yield (c * 10 + i, c * 10 + j))
    val got = labels(cliques, rounds = 5)
    assert(got === cliques.flatMap(p => Seq(p._1, p._2)).distinct
      .map(n => n -> (n / 10) * 10).toMap)
  }

  test("labels travel exactly one hop per round (the bounded-prefix contract)") {
    val path = (0L until 6L).map(i => (i, i + 1))
    // after 2 rounds node 5 has only seen min over nodes within 2 hops = 3
    val after2 = labels(path, rounds = 2)
    assert(after2(5L) === 3L)
    assert(after2(2L) === 0L)
    val after5 = labels(path, rounds = 5)
    assert(after5(5L) === 0L)
  }

  test("componentSizes aggregates the label table; checkpoint policies agree bit-for-bit") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
    val sizes = Components.componentSizes(edges.toDF("s", "t"), "s", "t", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(sizes === Map(1L -> 3L, 10L -> 2L, 20L -> 3L))
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    assert(labels(edges, 4, Some(dir)) === labels(edges, 4, None))
  }
}
