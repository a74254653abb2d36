package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth BFS hop distances from a source set — the third
  * iterative-fixpoint pattern next to [[PageRank]] (sum-propagation) and
  * the connected-components clustering in `llm/DedupPipeline`
  * (min-label-propagation to convergence): here each round is one
  * min-plus relaxation, the relational form of the frontier expansion
  * every MapReduce graph-BFS job chain runs (one job per level, distance
  * in the key — the reference's iterative-driver idiom).
  *
  * All-integer distances make the result engine-exact: the registered
  * query hash-checks against a DuckDB oracle that unrolls the same
  * rounds as chained CTEs. Unreached nodes simply don't appear (no
  * sentinel infinities to agree on).
  *
  * Round cost: distances join edges on the source endpoint (one
  * shuffle), candidate distances min-combine per destination with
  * map-side partial aggregation — a hub receiving millions of frontier
  * edges collapses to one row per partition before the wire, the same
  * argument as PageRank's hot-dst probe. State is O(|reached nodes|) and
  * rounds are bounded by the caller (`maxHops`), so the plan depth is
  * static; for unbounded diameters use checkpoint-every-k like the
  * connected-components loop.
  */
object GraphPaths {

  /** Hop distance (node, d) for every node reachable from `sources`
    * within `maxHops` DIRECTED hops; pass the symmetrized edge list for
    * undirected semantics. Sources sit at d = 0 even if also reachable
    * later. `checkpointDir` selects the reliable-checkpoint pin
    * ([[Checkpoints]]). */
  def shortestHops(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, sourceCol: String, maxHops: Int,
                   checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    // cached PARTITIONED AND SORTED on the relaxation key: each round's
    // join then exchanges and sorts only the O(|reached|) distance side
    // while the corpus-sized edge relation is read in place (same
    // partition-once rationale as Components/PageRank)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      .repartition(col("src")).sortWithinPartitions("src").persist()
    var dist = sources.select(col(sourceCol).cast("long").as("node"))
      .distinct().select(col("node"), lit(0L).as("d"))
    (1 to maxHops).foreach { _ =>
      // each round references the previous distance table TWICE (join
      // input + union input), so an unpinned logical plan doubles per
      // round — 2^maxHops analysis-time tree walks and re-executed
      // subplans. The pin truncates lineage eagerly each round
      // (state is O(|reached nodes|)); see GraphCores for the same
      // pattern at fan-out three.
      val next = Checkpoints.pin(relaxOnce(dist, e), checkpointDir)
      Checkpoints.release(dist, checkpointDir) // superseded round's blocks
      dist = next
    }
    // the final dist is checkpoint-materialized, so nothing reads the
    // pinned edge relation lazily anymore — release it here rather than
    // leaking it into the session's block manager
    e.unpersist(blocking = false)
    dist
  }

  private def relaxOnce(dist: DataFrame, e: DataFrame): DataFrame = {
    val relaxed = dist.join(e, col("node") === col("src"))
      .select(col("dst").as("node"), (col("d") + 1L).as("d"))
    dist.union(relaxed).groupBy("node").agg(min(col("d")).as("d"))
  }

  /** BFS to the FIXPOINT — full reachability with no diameter to guess.
    * Convergence is read off an exact integer fingerprint of the pinned
    * distance table: a relaxation round can only ADD nodes (count grows)
    * or LOWER distances (sum shrinks), so (count, sum d) unchanged ⇔
    * nothing changed. Both numbers come from one small agg over the
    * already-materialized O(|reached|) table — no diffing join. Returns
    * (distances, rounds run). The bounded-prefix [[shortestHops]] stays
    * the oracle-checked form; this is the production form for unknown
    * diameters, with `checkpointDir` for executor-loss resilience. */
  def shortestHopsConverged(edges: DataFrame, srcCol: String, dstCol: String,
                            sources: DataFrame, sourceCol: String,
                            maxRounds: Int = 100,
                            checkpointDir: Option[String] = None): (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    var dist = Checkpoints.pin(
      sources.select(col(sourceCol).cast("long").as("node"))
        .distinct().select(col("node"), lit(0L).as("d")),
      checkpointDir)
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(col("d")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = fingerprint(dist)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = Checkpoints.pin(relaxOnce(dist, e), checkpointDir)
      val fp = fingerprint(next)
      Checkpoints.release(dist, checkpointDir)
      dist = next
      rounds += 1
      converged = fp == prev
      prev = fp
    }
    e.unpersist(blocking = false)
    (dist, rounds)
  }
}
