package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{DedupPipeline, TextDedup}

/** Near-dup INGEST GATE — the production composition of the persisted
  * MinHash band index with the dedup pipeline: a document stream is
  * admitted into a corpus that stays near-dup-free.
  *
  * Each batch is processed in two stages:
  *   1. CROSS rejection: docs with a qualifying near-dup already in the
  *      corpus are rejected. Candidates come from
  *      [[TextDedup.incrementalMinhashLsh]] — batch bands probe the
  *      persisted index, so the per-batch cost is batch-sized, never
  *      corpus-sized (the round-7 asymmetry probe's shape).
  *   2. WITHIN-batch clustering: qualifying pairs among the survivors
  *      are clustered ([[DedupPipeline.components]]) and one
  *      representative (cluster-min id) is admitted per cluster.
  * Admitted docs join the corpus and their bands join the index, so
  * later batches dedup against them too.
  *
  * The defining invariant — pinned in IngestGateSpec under several
  * batchings — is that the ADMITTED corpus contains no qualifying pair
  * at the threshold. The admitted SET itself is batching-dependent, and
  * inherently so for any online gate: a doc rejected for duplicating an
  * earlier admit never enters the corpus, so its OWN near-dups (which a
  * one-shot clustering would have collapsed into the same cluster) can
  * be admitted later. Re-clustering the accumulated corpus offline
  * ([[DedupPipeline.cleanCorpus]]) is the batch answer when a globally
  * minimal corpus matters more than online latency.
  *
  * Streaming shape: `foreachBatch` — pair generation aggregates the
  * batch several ways, which is not expressible as one continuous
  * query; foreachBatch is the Structured Streaming idiom for exactly
  * this batch-composed maintenance (the same place a Delta MERGE sits).
  * State (corpus, index) is lineage-truncated every step via
  * localCheckpoint, so a long stream's plan stays flat. At production
  * scale the state lives on disk instead: append admitted docs to the
  * corpus table and their bands via [[TextDedup.saveBandIndex]] /
  * [[graft.llm.IndexStore]] — the per-batch math is identical, only the
  * union targets change.
  */
object IngestGate {

  /** The gate's accumulated state: the admitted corpus `(id, text)` and
    * its band index (both lineage-truncated each step). */
  final case class GateState(corpus: DataFrame, index: DataFrame)

  /** Seed state from an existing (already deduplicated) corpus. */
  def init(corpus: DataFrame, idCol: String, textCol: String,
           shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): GateState = {
    val c = corpus.select(col(idCol), col(textCol)).localCheckpoint()
    GateState(c,
      TextDedup.minhashBandIndex(c, idCol, textCol, shingleN, numHashes, bands)
        .localCheckpoint())
  }

  /** Admit one batch: returns (admitted docs, next state). */
  def step(state: GateState, batch: DataFrame, idCol: String, textCol: String,
           threshold: Double = 0.8, shingleN: Int = 3, numHashes: Int = 128,
           bands: Int = 32): (DataFrame, GateState) = {
    val b = batch.select(col(idCol), col(textCol))
    val pairs = TextDedup.incrementalMinhashLsh(b, state.corpus, state.index,
        idCol, textCol, threshold, shingleN, numHashes, bands)
      .localCheckpoint() // read four ways below; truncates stream lineage
    val bIds = b.select(col(idCol).as("__bid"))
    // a pair's non-batch side is a corpus doc (incremental emits no
    // corpus-corpus pairs) → the batch side is rejected
    val crossRej = pairs.join(bIds, col("id1") === col("__bid"), "left_anti")
      .select(col("id2").as("__rid"))
      .unionByName(pairs.join(bIds, col("id2") === col("__bid"), "left_anti")
        .select(col("id1").as("__rid")))
      .distinct()
    val survivors = b.join(crossRej, col(idCol) === col("__rid"), "left_anti")
    // qualifying pairs among SURVIVORS only (restriction of the pair
    // relation — per-pair Jaccard is independent of the rest)
    val inPairs = pairs
      .join(bIds, col("id1") === col("__bid"), "left_semi")
      .join(bIds, col("id2") === col("__bid"), "left_semi")
      .join(crossRej, col("id1") === col("__rid"), "left_anti")
      .join(crossRej, col("id2") === col("__rid"), "left_anti")
    val reps = DedupPipeline.components(inPairs)
    val admitted = survivors
      .join(reps, survivors(idCol) === reps("id"), "left_outer")
      .filter(col("rep").isNull || col("rep") === survivors(idCol))
      .select(col(idCol), col(textCol))
      .localCheckpoint()
    val nextCorpus = state.corpus.unionByName(admitted).localCheckpoint()
    val nextIndex = state.index.unionByName(
        TextDedup.minhashBandIndex(admitted, idCol, textCol,
          shingleN, numHashes, bands))
      .localCheckpoint()
    (admitted, GateState(nextCorpus, nextIndex))
  }

  /** Fold a sequence of batches through the gate (the foreachBatch loop
    * as a function — tests and backfills). */
  def run(state: GateState, batches: Seq[DataFrame], idCol: String,
          textCol: String, threshold: Double = 0.8): (DataFrame, GateState) =
    batches.foldLeft((Option.empty[DataFrame], state)) {
      case ((acc, st), batch) =>
        val (admitted, next) = step(st, batch, idCol, textCol, threshold)
        (Some(acc.map(_.unionByName(admitted)).getOrElse(admitted)), next)
    } match {
      case (admitted, finalState) =>
        (admitted.getOrElse(state.corpus.limit(0)), finalState)
    }
}
