package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for incremental MV maintenance: any split of a change feed,
  * applied in any number of rounds, lands bit-identical to a full
  * recompute; groups fully deleted vanish; groups born in the delta
  * appear. */
class MvSpec extends SparkTestBase {
  import spark.implicits._

  private def recompute(rows: Seq[(Int, Long)]): Map[Int, (Long, Long)] =
    rows.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum)
    }

  private def asMap(mv: DataFrame): Map[Int, (Long, Long)] =
    mv.as[(Int, Long, Long)].collect().map { case (k, n, s) => k -> (n, s) }.toMap

  test("one-shot delta application equals recompute") {
    val rnd = new scala.util.Random(47)
    val base = (1 to 2000).map(i => (rnd.nextInt(50), rnd.nextInt(1000).toLong))
    // delete a random subset OF BASE rows, insert fresh ones
    val (deleted, kept) = base.partition(_ => rnd.nextBoolean())
    val inserts = (1 to 800).map(_ => (rnd.nextInt(60), rnd.nextInt(1000).toLong))
    val mv = MaterializedView.build(base.toDF("k", "v"), "k", col("v"))
    val delta =
      inserts.map { case (k, v) => (k, v, "I") }
        .++(deleted.map { case (k, v) => (k, v, "D") })
        .toDF("k", "v", "op")
    val got = asMap(MaterializedView.applyDelta(mv, delta, "k", col("v"), col("op")))
    assert(got === recompute(kept ++ inserts))
  }

  test("folding the feed in many rounds equals folding it in one") {
    val rnd = new scala.util.Random(53)
    val base = (1 to 1500).map(i => (rnd.nextInt(40), rnd.nextInt(500).toLong))
    var state = base
    var mv = MaterializedView.build(base.toDF("k", "v"), "k", col("v"))
    (1 to 4).foreach { round =>
      val (deleted, kept) = state.partition(_ => rnd.nextInt(4) == 0)
      val inserts = (1 to 200).map(_ => (rnd.nextInt(45), rnd.nextInt(500).toLong))
      val delta = inserts.map { case (k, v) => (k, v, "I") }
        .++(deleted.map { case (k, v) => (k, v, "D") })
        .toDF("k", "v", "op")
      mv = MaterializedView.applyDelta(mv, delta, "k", col("v"), col("op"))
      state = kept ++ inserts
      assert(asMap(mv) === recompute(state), s"diverged at round $round")
    }
  }

  test("a fully-deleted group vanishes; a delta-born group appears") {
    val base = Seq((1, 10L), (1, 20L), (2, 5L)).toDF("k", "v")
    val mv = MaterializedView.build(base, "k", col("v"))
    val delta = Seq((1, 10L, "D"), (1, 20L, "D"), (9, 99L, "I")).toDF("k", "v", "op")
    val got = asMap(MaterializedView.applyDelta(mv, delta, "k", col("v"), col("op")))
    assert(got === Map(2 -> (1L, 5L), 9 -> (1L, 99L)))
  }
}
