package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round connected components: exactly `rounds` rounds of
  * min-label propagation, the same recurrence
  * [[graft.llm.DedupPipeline.components]] runs to convergence
  * (relational O(diameter)-round CC per Rastogi et al., "Finding
  * Connected Components in Map-Reduce in Logarithmic Rounds", ICDE
  * 2013 — the hash-min variant).
  *
  * The bounded form exists for the same reason bounded
  * PageRank/BFS/k-core do ([[PageRank]], [[GraphPaths]], [[GraphCores]]):
  * a fixed unrolling is integral and deterministic, so a DuckDB mirror
  * that chains the identical recurrence as CTEs hash-matches it — the
  * driver's oracle certifies the propagation kernel, and ComponentsSpec
  * pins that on a fixture converging within the bound the bounded output
  * EQUALS the convergent pipeline's, transferring the certificate to the
  * production path.
  *
  * Each round is one join + one groupBy, both shuffling on node id —
  * a fixed per-round cost in the graph's edge count, no driver-side
  * graph state. `checkpointDir` selects the reliable-checkpoint pin for
  * cluster runs where an executor loss must not fail the fold
  * ([[Checkpoints]]).
  */
object Components {

  /** (node, rep) after exactly `rounds` propagation rounds; `rep` is the
    * minimum node id reachable within `rounds` hops (= the component
    * representative once `rounds` ≥ the component diameter). */
  def labelsBounded(edges: DataFrame, srcCol: String, dstCol: String,
                    rounds: Int,
                    checkpointDir: Option[String] = None): DataFrame = {
    // symmetrize once; labels flow both directions each round.
    // Symmetrize by EXPLODING each edge into its two directions instead
    // of a self-union: the two branches of a union over an un-pinned
    // plan each re-run the caller's edge build (for the registered
    // queries that is a full orders⋈lineitem join — executed twice);
    // the explode emits both directions in ONE pass over one execution
    // of the build (guide §2.4: remove duplicate work the optimizer
    // cannot see through a union).
    // ... and pin it PARTITIONED AND SORTED on the probe key: every
    // round's join requires hash(id1) distribution and id1 ordering, so
    // establishing them once in the pinned relation leaves each round
    // exchanging and sorting only the O(|nodes|) label side — without
    // this the corpus-sized sym relation re-exchanged and re-sorted
    // every round (guide §2.4: two operations keyed the same way share
    // one exchange).
    val sym = Checkpoints.pin(
      edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
        .select(explode(array(
          struct(col("s").as("id1"), col("d").as("id2")),
          struct(col("d").as("id1"), col("s").as("id2")))).as("e"))
        .select(col("e.id1").as("id1"), col("e.id2").as("id2"))
        .distinct()
        .repartition(col("id1")).sortWithinPartitions("id1"),
      checkpointDir)
    var labels = Checkpoints.pin(
      sym.select(col("id1").as("node")).distinct()
        .withColumn("rep", col("node")),
      checkpointDir)
    // pin EVERY round (r15 re-check: a cadence-2 pin was measured SLOWER
    // — labels fans out twice per round, so the unpinned intermediate
    // round is recomputed once per branch of the next round's join+union,
    // and the duplicated propagation work exceeds the saved pin job)
    for (_ <- 1 to rounds) {
      val next = Checkpoints.pin(
        sym.join(labels, sym("id1") === labels("node"))
          .select(col("id2").as("node"), col("rep"))
          .union(labels)
          .groupBy(col("node")).agg(min(col("rep")).as("rep")),
        checkpointDir)
      Checkpoints.release(labels, checkpointDir)
      labels = next
    }
    // the final pin already materialized `labels`, so the static edge
    // relation can be released here instead of leaking into the session
    // (the round-7 block-accumulation finding)
    Checkpoints.release(sym, checkpointDir)
    labels
  }

  /** Component summary for the registry: size and minimum-id
    * representative of each label group after `rounds` rounds. */
  def componentSizes(edges: DataFrame, srcCol: String, dstCol: String,
                     rounds: Int): DataFrame =
    labelsBounded(edges, srcCol, dstCol, rounds)
      .groupBy(col("rep")).agg(count(lit(1)).as("n_nodes"))
}
