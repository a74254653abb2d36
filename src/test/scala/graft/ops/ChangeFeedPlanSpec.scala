package graft.ops

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** Bounded change-feed plans: a consumer catching up over a long
  * append-only history must plan ONE tagged scan of the added files —
  * not an O(versions)-deep union of per-step diffs (which at thousands
  * of commits makes the DRIVER the bottleneck). Replace/DML steps fall
  * back to per-step diffs, splitting the feed into runs.
  */
class ChangeFeedPlanSpec extends SparkTestBase {

  private def wipe(loc: String): Unit = {
    val p = new Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("100-commit append catch-up plans one scan, content exact per version") {
    import spark.implicits._
    val loc = "/tmp/graft-test/cdf_plan_100"
    wipe(loc)
    (1 to 100).foreach { i =>
      Snapshots.commitAppend(Seq(i.toLong).toDF("id").coalesce(1), loc)
    }
    val feed = Snapshots.changeFeed(spark, loc, 0)
    // one leaf relation — the collapsed run — regardless of version count
    val leaves = feed.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"expected 1 scan for a pure-append history, " +
      s"got ${leaves.size}")
    // every row still carries the version that introduced it
    val rows = feed.select("change", "_commit_version", "id")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(rows == (1 to 100).map(i => ("insert", i.toLong, i.toLong)))
  }

  test("mixed history splits into append runs around the DML step") {
    import spark.implicits._
    val loc = "/tmp/graft-test/cdf_plan_mixed"
    wipe(loc)
    (1 to 10).foreach(i =>
      Snapshots.commitAppend(Seq(i.toLong).toDF("id").coalesce(1), loc))
    Snapshots.commitDelete(spark, loc, col("id") <= 3L) // v11: rewrites
    (11 to 20).foreach(i =>
      Snapshots.commitAppend(Seq(i.toLong).toDF("id").coalesce(1), loc))
    val feed = Snapshots.changeFeed(spark, loc, 0)
      .select("change", "_commit_version", "id")
      .as[(String, Long, Long)].collect().toSeq
    val inserts = feed.filter(_._1 == "insert").map(r => (r._2, r._3)).sorted
    assert(inserts == ((1 to 10).map(i => (i.toLong, i.toLong)) ++
      (11 to 20).map(i => ((i + 1).toLong, i.toLong))).sorted)
    assert(feed.filter(_._1 == "delete").map(_._3).sorted
      == Seq(1L, 2L, 3L))
    assert(feed.filter(_._1 == "delete").forall(_._2 == 11L))
    // plan stays shallow: two collapsed runs (1 leaf each) + one per-step
    // diff (each side feeds both exceptAll branches -> 4 leaves) — a
    // CONSTANT per DML step, independent of how many appends surround it
    val leaves = Snapshots.changeFeed(spark, loc, 0)
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size <= 6, s"expected few leaves, got ${leaves.size}")
  }
}
