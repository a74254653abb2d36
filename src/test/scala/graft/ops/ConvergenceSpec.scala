package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for the run-to-convergence graph layer and the reliable-
  * checkpoint pin policy ([[Checkpoints]]):
  *  - each convergent variant equals its bounded-round form at the round
  *    count it actually ran (same recurrence, so bit-equality is the
  *    contract, not approximate agreement);
  *  - convergence detection stops exactly at the fixpoint (no early stop
  *    on a still-moving state);
  *  - one loop run both ways — localCheckpoint vs reliable checkpoint —
  *    is bit-equal, so the fault-tolerance knob cannot change answers.
  */
class ConvergenceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag").toString

  private val rnd = new scala.util.Random(117)
  private val randomEdges: Seq[(Long, Long)] =
    (1 to 500).map(_ => (rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))

  test("kCoreNodesConverged reaches the bounded form's fixpoint and stops there") {
    val df = randomEdges.toDF("s", "t")
    val (core, rounds) = GraphCores.kCoreNodesConverged(df, "s", "t", k = 4)
    val bounded = GraphCores.kCoreNodes(df, "s", "t", k = 4, rounds = 30)
      .as[(Long, Long)].collect().toMap
    assert(core.as[(Long, Long)].collect().toMap === bounded)
    // the converged round count re-peels to the same edge set: one more
    // bounded round changes nothing
    assert(rounds >= 1)
    val atRounds = GraphCores.kCoreNodes(df, "s", "t", k = 4, rounds = rounds)
      .as[(Long, Long)].collect().toMap
    assert(atRounds === bounded)
  }

  test("kCoreNodes is bit-equal under local vs reliable checkpointing") {
    val df = randomEdges.toDF("s", "t")
    val local = GraphCores.kCoreNodes(df, "s", "t", k = 3, rounds = 10)
      .as[(Long, Long)].collect().toSet
    val reliable = GraphCores.kCoreNodes(df, "s", "t", k = 3, rounds = 10,
        checkpointDir = Some(tmpDir("kcore")))
      .as[(Long, Long)].collect().toSet
    assert(local === reliable)
  }

  test("shortestHopsConverged equals a bounded run past the diameter, counts rounds") {
    // two chains from the source plus an unreachable island
    val edges = ((0L until 12L).map(i => (i, i + 1)) ++
      Seq((0L, 20L), (20L, 21L), (40L, 41L))).toDF("s", "t")
    val sources = Seq(0L).toDF("n")
    val (dist, rounds) = GraphPaths.shortestHopsConverged(
      edges, "s", "t", sources, "n")
    val got = dist.as[(Long, Long)].collect().toMap
    val bounded = GraphPaths.shortestHops(edges, "s", "t", sources, "n", 20)
      .as[(Long, Long)].collect().toMap
    assert(got === bounded)
    assert(!got.contains(40L) && !got.contains(41L))
    // chain diameter is 12; the fixpoint needs 12 improving rounds plus
    // the one unchanged round that proves it
    assert(rounds === 13)
  }

  test("shortestHops is bit-equal under local vs reliable checkpointing") {
    val edges = randomEdges.toDF("s", "t")
    val sources = Seq(0L, 1L).toDF("n")
    val local = GraphPaths.shortestHops(edges, "s", "t", sources, "n", 6)
      .as[(Long, Long)].collect().toSet
    val reliable = GraphPaths.shortestHops(edges, "s", "t", sources, "n", 6,
        checkpointDir = Some(tmpDir("hops")))
      .as[(Long, Long)].collect().toSet
    assert(local === reliable)
  }

  test("ranksConverged equals the bounded recurrence at its stop round and terminates") {
    val edges = randomEdges.toDF("s", "t")
    val (ranks, rounds) = PageRank.ranksConverged(edges, "s", "t",
      epsUnits = 1L, maxIterations = 200, checkpointEvery = 5)
    assert(rounds < 200, "damping contraction must terminate well before the cap")
    val got = ranks.as[(Long, Long)].collect().toMap
    val bounded = PageRank.ranks(edges, "s", "t", iterations = rounds)
      .as[(Long, Long)].collect().toMap
    assert(got === bounded)
    // and the stop state is genuinely settled: five more rounds move no
    // node by more than the ±1-unit integer-truncation jitter band plus
    // one unit of propagation slack
    val more = PageRank.ranks(edges, "s", "t", iterations = rounds + 5)
      .as[(Long, Long)].collect().toMap
    assert(got.forall { case (n, pr) => math.abs(more(n) - pr) <= 2L })
  }

  test("ranksConverged on a symmetric cycle hits the exact uniform fixpoint") {
    // a directed cycle: every node has outdeg 1 and indeg 1, so the
    // uniform start state is ALREADY the fixpoint of the integer
    // recurrence: teleport + 0.85*scale = scale exactly at scale 1e6
    val n = 10L
    val cycle = (0L until n).map(i => (i, (i + 1) % n)).toDF("s", "t")
    val (ranks, rounds) = PageRank.ranksConverged(cycle, "s", "t",
      epsUnits = 0L, checkpointEvery = 3)
    assert(rounds === 3, "first window must already verify the fixpoint")
    val got = ranks.as[(Long, Long)].collect().toMap
    assert(got === (0L until n).map(_ -> 1000000L).toMap)
  }

  test("connected components are bit-equal under local vs reliable checkpointing") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 11L), (11L, 12L), (3L, 4L))
      .toDF("id1", "id2")
    val local = graft.llm.DedupPipeline.components(pairs)
      .as[(Long, Long)].collect().toSet
    val reliable = graft.llm.DedupPipeline.components(pairs,
        checkpointDir = Some(tmpDir("cc")))
      .as[(Long, Long)].collect().toSet
    assert(local === reliable)
    assert(local === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (7L, 7L), (8L, 7L), (10L, 10L), (11L, 10L), (12L, 10L)))
  }
}
