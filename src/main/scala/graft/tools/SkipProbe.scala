package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-skipping probe: the same 1.5M-row table written hash-shuffled vs
  * z-order-clustered (`ops/ZOrder.cluster`), probed with selective range
  * filters on each clustering dimension, measuring REAL task input bytes
  * (not plan claims) via a listener. The clustered layout should read a
  * small fraction of the shuffled layout's bytes: tight per-file/row-group
  * min-max stats let the parquet reader skip whole row groups, the same
  * mechanism that turns a 100 TB scan into a few-GB scan for a selective
  * dashboard query. This is the read-side payoff zorder_key only claims.
  */
object SkipProbe {

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def measure(f: => Long): (Long, Long) = {
      bytesRead.set(0L)
      val rows = f
      // listener events drain asynchronously; settle before reading
      var prev = -1L
      while (prev != bytesRead.get) { prev = bytesRead.get; Thread.sleep(200) }
      (rows, bytesRead.get)
    }

    val o = graft.core.Tables.orders(spark, d)
      .withColumn("x", col("o_orderkey") % 1024)
      .withColumn("y", col("o_custkey") % 1024)
    val shuffled = "/tmp/graft-warehouse/skipprobe/shuffled"
    val zordered = "/tmp/graft-warehouse/skipprobe/zordered"
    o.repartition(64).write.mode("overwrite").parquet(shuffled)
    graft.ops.ZOrder.cluster(o, bits = 10, numFiles = 64, col("x"), col("y"))
      .write.mode("overwrite").parquet(zordered)

    def probe(name: String, pred: DataFrame => DataFrame): Unit = {
      val (rs, bs) = measure(pred(spark.read.parquet(shuffled)).count())
      val (rz, bz) = measure(pred(spark.read.parquet(zordered)).count())
      require(rs == rz, s"$name: row counts diverged ($rs vs $rz)")
      println(f"SKIPPROBE $name: rows=$rs shuffled=${bs / 1e6}%.1fMB " +
        f"zordered=${bz / 1e6}%.1fMB skip_ratio=${bs.toDouble / bz}%.1fx")
    }
    probe("x_range", _.filter(col("x").between(100, 115)))
    probe("y_range", _.filter(col("y").between(400, 415)))
    probe("point_xy", _.filter(col("x") === 7 && col("y") === 7))
    spark.stop()
  }
}
