package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.hadoop.fs.Path

import graft.SparkTestBase
import graft.ops.Snapshots

/** The DSv2 streaming source over a snapshot table
  * (`sources/v2/SnapshotStream.scala`): offsets are versions, each
  * micro-batch reads exactly the files its commits added, and a real
  * `Trigger.AvailableNow` run over an append history equals the batch
  * [[Snapshots.changeFeed]] two-sided. Also pins checkpointed restart
  * (only NEW commits replay) and the fail-fast / skipChangeCommits
  * contract on DML commits.
  */
class SnapshotStreamSpec extends SparkTestBase {

  private def wipe(paths: String*): Unit = paths.foreach { x =>
    val p = new Path(x)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def runAvailableNow(loc: String, ck: String, sink: String,
                              skipChangeCommits: Boolean = false): Unit = {
    val q = spark.readStream
      .format(classOf[graft.sources.v2.SnapshotStreamProvider].getName)
      .option("location", loc)
      .option("skipChangeCommits", skipChangeCommits.toString)
      .load()
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
  }

  test("AvailableNow over an append history equals the batch changeFeed") {
    import spark.implicits._
    val loc = "/tmp/graft-test/stream_src"
    val ck = "/tmp/graft-test/stream_src_ck"
    val sink = "/tmp/graft-test/stream_src_out"
    wipe(loc, ck, sink)
    Snapshots.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc)
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "v"), loc)
    Snapshots.commitAppend(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), loc)
    runAvailableNow(loc, ck, sink)
    val streamed = spark.read.parquet(sink)
      .select("change", "_commit_version", "id", "v")
      .as[(String, Long, Long, String)].collect().sorted.toSeq
    val batch = Snapshots.changeFeed(spark, loc, 0)
      .select("change", "_commit_version", "id", "v")
      .as[(String, Long, Long, String)].collect().sorted.toSeq
    assert(streamed == batch, "stream must equal the batch change feed")
    assert(streamed.map(_._2).distinct.sorted == Seq(1L, 2L, 3L))
  }

  test("a restarted stream resumes at the checkpointed version — no replay") {
    import spark.implicits._
    val loc = "/tmp/graft-test/stream_resume"
    val ck = "/tmp/graft-test/stream_resume_ck"
    val sink = "/tmp/graft-test/stream_resume_out"
    wipe(loc, ck, sink)
    Snapshots.commitAppend(Seq(1L, 2L).toDF("id"), loc)
    runAvailableNow(loc, ck, sink)
    assert(spark.read.parquet(sink).count() == 2)
    Snapshots.commitAppend(Seq(10L).toDF("id"), loc)
    runAvailableNow(loc, ck, sink) // same checkpoint: only v2 streams
    val rows = spark.read.parquet(sink)
      .select("_commit_version", "id").as[(Long, Long)].collect().sorted.toSeq
    assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 10L)),
      s"restart must not replay committed versions: $rows")
  }

  test("maxVersionsPerTrigger rate-limits the drain into bounded micro-batches") {
    import spark.implicits._
    val loc = "/tmp/graft-test/stream_rate"
    val ck = "/tmp/graft-test/stream_rate_ck"
    val sink = "/tmp/graft-test/stream_rate_out"
    wipe(loc, ck, sink)
    (1 to 6).foreach(i => Snapshots.commitAppend(Seq(i.toLong).toDF("id"), loc))
    val q = spark.readStream
      .format(classOf[graft.sources.v2.SnapshotStreamProvider].getName)
      .option("location", loc)
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "rate-limited drain did not finish")
    // a 6-version backlog at 2 versions/trigger drains in 3 batches, and
    // AvailableNow still reaches the pinned end
    val progressed = q.recentProgress.count(_.numInputRows > 0)
    assert(progressed >= 3, s"expected >=3 non-empty batches, got $progressed")
    assert(spark.read.parquet(sink).select("id").as[Long]
      .collect().sorted.toSeq == (1L to 6L))
  }

  test("a DML commit fails the stream fast; skipChangeCommits skips it") {
    import spark.implicits._
    val loc = "/tmp/graft-test/stream_dml"
    val ck = "/tmp/graft-test/stream_dml_ck"
    val sink = "/tmp/graft-test/stream_dml_out"
    wipe(loc, ck, sink)
    Snapshots.commitAppend(Seq((1L, "x"), (2L, "drop")).toDF("id", "v"), loc)
    Snapshots.commitDelete(spark, loc, col("v") === "drop") // v2: rewrite
    Snapshots.commitAppend(Seq((9L, "y")).toDF("id", "v"), loc)
    val e = intercept[Exception](runAvailableNow(loc, ck, sink))
    assert(e.getMessage != null)
    wipe(ck, sink)
    runAvailableNow(loc, ck, sink, skipChangeCommits = true)
    val rows = spark.read.parquet(sink)
      .select("_commit_version", "id").as[(Long, Long)].collect().sorted.toSeq
    // v1's inserts and v3's insert stream; v2 (the rewrite) is skipped
    assert(rows == Seq((1L, 1L), (1L, 2L), (3L, 9L)), s"got $rows")
  }
}
