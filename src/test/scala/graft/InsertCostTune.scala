package graft

import org.apache.spark.sql.functions._

/** Scratch: routed SQL INSERT vs API appendBucketed at data-bound scale. */
object InsertCostTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val loc = "/tmp/graft-probe/ins_tune"
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.conf.set("spark.sql.catalog.itune",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.itune.root", "/tmp/graft-probe")
    graft.ops.Snapshots.commitAppend(
      spark.range(0L, 1000000L).toDF("id")
        .withColumn("v", concat(lit("payload-"), col("id") % 100000)), loc)
    graft.ops.BucketLayout.commitBucketed(spark, loc, "id", 16)
    def batch(lo: Long) = spark.range(lo, lo + 24000000L).toDF("id")
      .withColumn("v", concat(lit("payload-"), col("id") % 100000))
    batch(24000000L).createOrReplaceTempView("b")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val run = si.taskMetrics.executorRunTime
        stages.add(f"stage ${si.stageId} ${si.name.take(60)} wall=${ms / 1e3}%.2fs taskTime=${run / 1e3}%.1fs tasks=${si.numTasks}")
      }
    })
    def t(n: String)(f: => Unit): Double = {
      stages.clear()
      val t0 = System.nanoTime(); f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$n: $w%.2fs")
      stages.forEach(s => println("  " + s))
      w
    }
    val api = t("api") {
      graft.ops.BucketLayout.appendBucketed(spark, loc, batch(48000000L))
    }
    val sql = t("sql") {
      spark.sql("INSERT INTO itune.ins_tune SELECT * FROM b")
    }
    println(f"RATIO sql/api = ${sql / api}%.2f")
    val df = spark.sql("EXPLAIN FORMATTED INSERT INTO itune.ins_tune SELECT * FROM b")
    println(df.collect().head.getString(0).take(3000))
    spark.stop()
  }
}
