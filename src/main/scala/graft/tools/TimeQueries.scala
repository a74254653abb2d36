package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused bench slice for optimization work: time the named registry
  * queries with EXACTLY the Bench methodology (same session defaults,
  * noop sink, min-of-N with clearCache between repeats) so numbers are
  * comparable to `bench_detail*.json` rows without paying the full
  * 230-query pass.
  *
  * Usage: `runMain graft.tools.TimeQueries <query...>`
  *   env SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  *       SPARK_GRAFT_CPUS   (default 32)
  *       SPARK_GRAFT_RUNS   (default 3)
  * Prints one line per query: `TIME <name> <min> [all runs...]`.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val showStages = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    val spark = graft.core.Sessions.withDefaults(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // stage-level attribution (SPARK_GRAFT_STAGES=1): wall + task time +
    // shuffle bytes per stage, printed for the slowest stages of each query
    val stages = new scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Long, Long)]
    val jobs = new scala.collection.mutable.HashMap[Int, Long] // id -> start
    val jobSpans = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
    if (showStages) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.synchronized { jobs(j.jobId) = j.time }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.synchronized { jobs.remove(j.jobId).foreach(t0 =>
            jobSpans += ((t0, j.time))) }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          stages.synchronized { stages += ((
            si.name.linesIterator.next().take(90), wall,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.jvmGCTime)) }
        }
      })
    graft.SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to runs).flatMap { r =>
        if (r == runs) { // keep only last run's stages/jobs
          stages.synchronized(stages.clear())
          jobs.synchronized { jobSpans.clear() }
        }
        val t0 = System.nanoTime()
        try {
          spark.sparkContext.setJobDescription(name)
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[time] $name failed: ${e.getMessage}")
          None
        } finally spark.catalog.clearCache()
      }
      if (times.isEmpty) println(s"TIME $name FAILED")
      else println(f"TIME $name ${times.min}%.2f  all=${times.map(t => f"$t%.2f").mkString(",")}")
      if (showStages) {
        Thread.sleep(300) // let listener events drain
        val top = stages.synchronized(stages.sortBy(-_._2).take(12).toList)
        top.foreach { case (n, wall, task, sr, sw, gc) =>
          println(f"  STAGE ${wall}%6d ms  task=${task}%6d ms  gc=${gc}%5d ms  sRead=${sr / 1024}%7d K  sWrite=${sw / 1024}%7d K  $n")
        }
        val all = stages.synchronized(stages.toList)
        println(f"  STAGES n=${all.size}  wallSum=${all.map(_._2).sum}%d ms  taskSum=${all.map(_._3).sum}%d ms  gcSum=${all.map(_._6).sum}%d ms")
        // merged job-span coverage: wall time with >=1 job running; the
        // query wall minus this = pure driver-side time (planning, FS,
        // commit) with NO job in flight
        val spans = jobs.synchronized(jobSpans.sortBy(_._1).toList)
        var covered = 0L; var cur = Long.MinValue
        var end = Long.MinValue
        spans.foreach { case (s0, e0) =>
          if (s0 > end) { if (end > cur) covered += end - cur; cur = s0; end = e0 }
          else if (e0 > end) end = e0
        }
        if (end > cur) covered += end - cur
        println(f"  JOBS n=${spans.size}  inJobWall=${covered}%d ms")
      }
    }
    spark.stop()
  }
}
