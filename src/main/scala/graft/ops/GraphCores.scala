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

  /** Surviving nodes and their degrees after `rounds` peels of every
    * node with degree < k. Output: (node, deg) — the exact k-core's
    * membership and degrees when the peel has converged within the
    * round budget. */
  def kCoreNodes(edges: DataFrame, srcCol: String, dstCol: String,
                 k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = Triangles.canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    def degrees(g: DataFrame): DataFrame =
      g.select(col("a").as("node")).union(g.select(col("b").as("node")))
        .groupBy("node")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    (1 to rounds).foreach { _ =>
      val keep = degrees(e).filter(col("deg") >= k).select("node")
      val next = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
      // next is materialized (eager checkpoint) — the previous round's
      // blocks are dead; release them instead of waiting on GC
      Lineage.releaseLocalCheckpoint(e)
      e = next
    }
    degrees(e)
  }
}
