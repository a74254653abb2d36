package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling (Seidman 1983, "Network structure and
  * minimum degree"; the BSP formulation of Montresor, De Pellegrini,
  * Miorandi, TPDS 2013) — the density-filtering fourth member of the
  * graph family (rank: [[PageRank]], count: [[Triangles]], reach:
  * [[GraphPaths]], core: here), and the standard pre-filter a
  * trillion-edge pipeline runs BEFORE anything quadratic-ish: peeling
  * low-degree fringe first shrinks the graph the expensive operators
  * see.
  *
  * Each round drops every node whose CURRENT degree is below k — a
  * degree aggregation plus two semi-joins, all keyed on node ids,
  * nothing collected. Removal cascades (a node can fall under k because
  * its neighbors left), so the exact k-core is the fixpoint; `rounds`
  * bounds the unrolled prefix, which is (a) deterministic and
  * cross-engine hash-comparable — the oracle unrolls the same R rounds
  * as CTEs — and (b) the exact k-core whenever some round removes
  * nothing (GraphCoresSpec pins fixpoint equality on its fixtures).
  * Distributed cost per round: one shuffle for degrees, two semi-join
  * shuffles on the shrinking edge set.
  *
  * Each round ends in `localCheckpoint`, not `persist`: the next round
  * references its edges THREE times (degree build + both endpoint
  * filters), and a merely-cached plan still nests all three copies in
  * the logical tree — Catalyst's un-memoized tree walks then cost
  * 3^rounds and hang a 20-round peel before a single task launches.
  * Checkpointing truncates lineage to the materialized RDD, making
  * per-round analysis cost constant — the same reason the
  * connected-components loop checkpoints (`llm/DedupPipeline`).
  */
object GraphCores {

  private def degrees(g: DataFrame): DataFrame =
    g.select(col("a").as("node")).union(g.select(col("b").as("node")))
      .groupBy("node")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))

  private def peelOnce(e: DataFrame, k: Int): DataFrame = {
    val keep = degrees(e).filter(col("deg") >= k).select("node")
    e.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
      .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
  }

  /** Surviving nodes and their degrees after `rounds` peels of every
    * node with degree < k. Output: (node, deg) — the exact k-core's
    * membership and degrees when the peel has converged within the
    * round budget. `checkpointDir` selects the reliable-checkpoint pin
    * for clusters where executor loss must not fail a long peel
    * ([[Checkpoints]]). */
  def kCoreNodes(edges: DataFrame, srcCol: String, dstCol: String,
                 k: Int, rounds: Int,
                 checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = Checkpoints.pin(
      Triangles.canonicalEdges(edges, srcCol, dstCol), checkpointDir)
    (1 to rounds).foreach { _ =>
      val next = Checkpoints.pin(peelOnce(e, k), checkpointDir)
      // next is materialized (eager checkpoint) — the previous round's
      // blocks are dead; release them instead of waiting on GC
      Checkpoints.release(e, checkpointDir)
      e = next
    }
    degrees(e)
  }

  /** Peel to the FIXPOINT — the exact k-core with no round budget to
    * guess. Each round is already materialized by its pin, so the
    * convergence check is one count on a pinned relation: the peel only
    * removes edges, so an unchanged edge count means no node fell below
    * k and the core is final. Returns (nodes-with-degrees, rounds run).
    * For long peels on real clusters pass `checkpointDir` — the
    * bounded-round unrolling stays the oracle-checked form, this is the
    * production form (see DESIGN.md on the cadence cost). */
  def kCoreNodesConverged(edges: DataFrame, srcCol: String, dstCol: String,
                          k: Int, maxRounds: Int = 100,
                          checkpointDir: Option[String] = None): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var e = Checkpoints.pin(
      Triangles.canonicalEdges(edges, srcCol, dstCol), checkpointDir)
    var prevCount = e.count()
    var rounds = 0
    var converged = prevCount == 0L
    while (!converged && rounds < maxRounds) {
      val next = Checkpoints.pin(peelOnce(e, k), checkpointDir)
      val nextCount = next.count()
      Checkpoints.release(e, checkpointDir)
      e = next
      rounds += 1
      converged = nextCount == prevCount
      prevCount = nextCount
    }
    (degrees(e), rounds)
  }
}
