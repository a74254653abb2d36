package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-analysis ranking (Page, Brin, Motwani, Winograd 1999)
  * as pure relational algebra — the canonical "iterative job chain" the
  * reference expresses as one MapReduce pass per iteration (driver loop
  * re-submitting a job, the shape of every `EX/` iterative example): here
  * each iteration is a join + partial-aggregated groupBy that Catalyst
  * plans whole, with AQE free to re-plan each round.
  *
  * FIXED-POINT INTEGER formulation: ranks live as longs scaled by
  * `scale` (default 10⁶), contributions use integral division, and the
  * damping update is `teleport + (85 · Σcontrib) div 100`. Long sums are
  * associative-exact — no FP association drift — so the result is
  * bit-identical under any partitioning, merge order, or engine, which
  * is what lets an iterative fixpoint computation pass a hash-compare
  * oracle (the DuckDB mirror unrolls the same recurrence as chained
  * CTEs). The ≤1-unit-per-division truncation bias is identical on both
  * sides and two orders of magnitude below scale.
  *
  * Dangling nodes (no out-edges) leak their mass each round — the
  * original formulation's behavior; redistribution variants change only
  * the recurrence constant, not the dataflow shape.
  *
  * 100 TB design: the edge relation is the only corpus-sized input. It
  * is joined once with the out-degree relation and persisted; each
  * iteration then shuffles (a) the rank table on node id for the join —
  * co-partitioned with the edge table's src hash partitioning after the
  * first round, so AQE reuses the exchange — and (b) per-edge
  * contributions into the dst-keyed partial agg (map-side combine
  * collapses them to one row per (partition, dst) before the wire). Rank
  * state is O(|nodes|), never collected; for hundreds of iterations the
  * caller should checkpoint every ~10 rounds to truncate lineage (same
  * contract as [[graft.llm.DedupPipeline]]'s connected components).
  */
object PageRank {

  /** Ranks after `iterations` rounds over the distinct edge list.
    * Output: (node, pr) — pr scaled by `scale`, start mass `scale` per
    * node, damping 0.85 in exact integer arithmetic. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    // both static relations persist LAZILY: every iteration references
    // nodes (teleport row set) and ed (edge+degree) — without the pins
    // each round would recompute the upstream edge build (a corpus-sized
    // join in the registered query) once per reference. An r15 experiment
    // measured the two plausible "improvements" both SLOWER on this
    // fixture: eager materialization (nodes.count(); ed.count()) adds
    // two serial jobs the lazy form overlaps with the main action's
    // concurrent leaf stages (+1.5 s), and caching ed
    // repartition+sortWithinPartitions(src) pays a corpus-sized exchange
    // up front that the per-round SMJ re-sorts do not amortize at this
    // iteration count (+2.5 s) — see OPTIMIZATION_r15.md.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val teleport = 15L * scale / 100L
    var ranks = nodes.select(col("node"), lit(scale).as("pr"))
    (1 to iterations).foreach { _ =>
      val contribs = ed.join(ranks.withColumnRenamed("node", "src"), "src")
        .selectExpr("dst AS node", "pr div outdeg AS c")
        .groupBy("node").agg(sum("c").as("cs"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .selectExpr("node",
          s"$teleport + (85 * coalesce(cs, 0L)) div 100 AS pr")
    }
    // materialize the answer (O(|nodes|)) so the pinned static relations
    // can be released HERE instead of leaking into the session — a lazy
    // return would still read them at action time, leaving no safe
    // unpersist point (the round-7 block-accumulation finding)
    val out = ranks.localCheckpoint()
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ed.unpersist(blocking = false)
    out
  }

  /** Iterate to CONVERGENCE instead of a fixed round count — the
    * production form for graphs whose mixing time is unknown. Rounds run
    * in windows of `checkpointEvery`: each window stacks its iterations
    * lazily (linear plan growth, cheap), then pins the rank table
    * ([[Checkpoints.pin]] — localCheckpoint, or a reliable checkpoint
    * under `checkpointDir` so executor loss on a long run recovers from
    * files instead of failing the job) and compares it against the
    * previous pinned table: one O(|nodes|) join between two materialized
    * relations per WINDOW, not per round. Stops when max |Δpr| ≤
    * `epsUnits` (integer scaled units; the damping contraction shrinks
    * deltas ~0.85×/round, so integer ranks reach a ±1-unit band and
    * epsUnits = 1 terminates on every graph). Convergence may overshoot
    * by up to checkpointEvery − 1 rounds — the documented trade for the
    * window cadence. Returns (ranks, rounds run). */
  def ranksConverged(edges: DataFrame, srcCol: String, dstCol: String,
                     epsUnits: Long = 1L, maxIterations: Int = 200,
                     checkpointEvery: Int = 10,
                     checkpointDir: Option[String] = None,
                     scale: Long = 1000000L): (DataFrame, Int) = {
    require(epsUnits >= 0L, s"epsUnits must be >= 0, got $epsUnits")
    require(maxIterations >= 1, s"maxIterations must be >= 1, got $maxIterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val teleport = 15L * scale / 100L
    def step(r: DataFrame): DataFrame = {
      val contribs = ed.join(r.withColumnRenamed("node", "src"), "src")
        .selectExpr("dst AS node", "pr div outdeg AS c")
        .groupBy("node").agg(sum("c").as("cs"))
      nodes.join(contribs, Seq("node"), "left")
        .selectExpr("node", s"$teleport + (85 * coalesce(cs, 0L)) div 100 AS pr")
    }
    var ranks = Checkpoints.pin(
      nodes.select(col("node"), lit(scale).as("pr")), checkpointDir)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIterations) {
      val window = math.min(checkpointEvery, maxIterations - rounds)
      var cur = ranks
      (1 to window).foreach(_ => cur = step(cur))
      val next = Checkpoints.pin(cur, checkpointDir)
      // both sides are pinned O(|nodes|) tables — the diff join is small
      val delta = next.withColumnRenamed("pr", "pr2")
        .join(ranks, Seq("node"))
        .agg(coalesce(max(abs(col("pr2") - col("pr"))), lit(0L))).head().getLong(0)
      Checkpoints.release(ranks, checkpointDir)
      ranks = next
      rounds += window
      converged = delta <= epsUnits
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ed.unpersist(blocking = false)
    (ranks, rounds)
  }
}
