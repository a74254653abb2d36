package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for degree-oriented triangle counting: known closed forms,
  * equality with a brute-force reference on random graphs, input
  * canonicalization (duplicates / reversed edges / self-loops), the
  * equi-join plan property (no nested-loop fallback), and the hub shape
  * the orientation exists for. */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def countOf(edges: Seq[(Long, Long)]): Long =
    Triangles.count(edges.toDF("src", "dst"), "src", "dst")
      .head().getLong(0)

  private def kN(n: Int): Seq[(Long, Long)] =
    for { i <- 0 until n; j <- i + 1 until n } yield (i.toLong, j.toLong)

  test("closed forms: triangle-with-tail, K4, K5, triangle-free, empty") {
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) === 1L)
    assert(countOf(kN(4)) === 4L)
    assert(countOf(kN(5)) === 10L)
    // C6 cycle has no triangles
    assert(countOf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L))) === 0L)
    assert(countOf(Seq((7L, 8L))) === 0L)
  }

  test("matches brute-force triple enumeration on random graphs") {
    val rnd = new scala.util.Random(59)
    (1 to 3).foreach { trial =>
      val n = 30
      val edges = (for { i <- 0L until n; j <- i + 1 until n
        if rnd.nextDouble() < 0.25 } yield (i, j)).toSeq
      val set = edges.toSet
      val brute = (for { i <- 0L until n; j <- i + 1 until n; k <- j + 1 until n
        if set((i, j)) && set((j, k)) && set((i, k)) } yield 1).size.toLong
      assert(countOf(edges) === brute, s"trial $trial")
    }
  }

  test("canonicalization: duplicates, reversed edges and self-loops don't change the count") {
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val dirty = clean ++ clean.map(_.swap) ++ Seq((2L, 2L), (1L, 2L), (3L, 2L))
    assert(countOf(dirty) === 1L)
  }

  test("plan pin: the closing probe is an equi-join — no nested-loop/cartesian fallback") {
    val df = Triangles.count(kN(6).toDF("src", "dst"), "src", "dst")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"triangle plan fell back to a non-equi join:\n$plan")
  }

  test("hub shape: a pure star yields zero wedges, not a d-squared blowup") {
    // 20k-leaf star: every edge orients leaf->hub, so no node has two
    // out-edges and the wedge relation is EMPTY — the naive undirected
    // wedge join would build 4*10^8 hub pairs here
    val star = spark.range(1, 20001).select(col("id").as("src"), lit(0L).as("dst"))
    val t0 = System.nanoTime()
    val n = Triangles.count(star, "src", "dst").head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === 0L)
    assert(secs < 60.0, f"star took $secs%.1f s — wedge bound not holding")
  }
}
