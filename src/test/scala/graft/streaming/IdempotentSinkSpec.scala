package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** Replay safety of the batch-partitioned streaming sink: duplicated
  * delivery of a micro-batch must not duplicate output, and a replay
  * must not disturb other batches' files. */
class IdempotentSinkSpec extends SparkTestBase {

  private def files(dir: String): Map[String, Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val it = fs.listFiles(p, true)
      val b = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_"))
          b += (f.getPath.toString -> f.getModificationTime)
      }
      b.toMap
    }
  }

  test("replayed batches overwrite their own partition; others untouched") {
    import spark.implicits._
    val dir = "/tmp/graft-test/idempotent_sink"
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(dir), true)

    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v")
    IdempotentSink.writeBatch(b0, dir, 0L)
    IdempotentSink.writeBatch(b1, dir, 1L)
    val after = spark.read.parquet(dir)
    assert(after.count() == 5)

    val batch0Files = files(dir).filter(_._1.contains("batch_id=0"))
    Thread.sleep(5)
    // at-least-once delivery: batch 1 arrives again (same content)
    IdempotentSink.writeBatch(b1, dir, 1L)
    val replayed = spark.read.parquet(dir)
    assert(replayed.count() == 5, "replay duplicated rows")
    assert(replayed.select("id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    // batch 0's files were not rewritten by batch 1's replay
    assert(files(dir).filter(_._1.contains("batch_id=0")) == batch0Files)
  }

  test("end-to-end: MemoryStream through the sink, then a simulated replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/tmp/graft-test/idempotent_stream"
    val ckpt = "/tmp/graft-test/idempotent_stream_ckpt"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.delete(new Path(ckpt), true)

    val mem = MemoryStream[(Long, String)]
    val q = IdempotentSink.partitionedParquet(mem.toDF().toDF("id", "v"), dir, ckpt)
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val once = spark.read.parquet(dir).select("id").as[Long].collect().sorted
      assert(once.sameElements(Array(1L, 2L, 3L)))
      // crash-between-write-and-commit: the last batch's data is delivered
      // again under its original batchId
      val lastBatch = spark.read.parquet(dir)
        .filter(col("batch_id") === 1).drop("batch_id")
      IdempotentSink.writeBatch(lastBatch, dir, 1L)
      val twice = spark.read.parquet(dir).select("id").as[Long].collect().sorted
      assert(twice.sameElements(Array(1L, 2L, 3L)), "replay duplicated rows")
    } finally q.stop()
  }
}
