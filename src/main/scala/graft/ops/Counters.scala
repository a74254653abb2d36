package graft.ops

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Job counters (reference parity: user enum counters + `Counters`,
  * `CORE/mapreduce/Counters.java`; framework `TaskCounter` enum,
  * `CORE/mapreduce/TaskCounter.java:28-46`).
  *
  * User counters = named `LongAccumulator`s (same merge semantics and the
  * same caveat as Hadoop counters: task retries/speculation can
  * over-count in-flight increments; both systems only guarantee exactness
  * for successfully committed tasks feeding an action).
  * Framework counters = task metrics captured by a SparkListener.
  */
object Counters {

  final class Registry(spark: SparkSession) {
    private val accs = TrieMap.empty[(String, String), LongAccumulator]

    def counter(group: String, name: String): LongAccumulator =
      accs.getOrElseUpdate((group, name),
        spark.sparkContext.longAccumulator(s"$group.$name"))

    /** Counter report as a DataFrame (group, name, value). */
    def report: DataFrame = {
      import spark.implicits._
      accs.toSeq.map { case ((g, n), a) => (g, n, a.value: Long) }
        .toDF("group", "name", "value")
    }
  }

  def registry(spark: SparkSession): Registry = new Registry(spark)

  /** Pass-through tick for `Dataset.map` pipelines — the
    * `context.getCounter(...).increment(1)` analog inside a mapper. */
  def tick[T](acc: LongAccumulator): T => T = { t => acc.add(1); t }

  /** Run `action` while capturing framework task metrics (TaskCounter
    * analog): records read, shuffle bytes, spills, GC time. */
  def withTaskMetrics[A](spark: SparkSession)(action: => A): (A, Map[String, Long]) = {
    val acc = TrieMap.empty[String, Long].withDefaultValue(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) acc.synchronized {
          def add(k: String, v: Long): Unit = acc(k) = acc(k) + v
          add("input_records", m.inputMetrics.recordsRead)
          add("input_bytes", m.inputMetrics.bytesRead)
          add("shuffle_read_bytes", m.shuffleReadMetrics.totalBytesRead)
          add("shuffle_write_bytes", m.shuffleWriteMetrics.bytesWritten)
          add("spilled_bytes", m.diskBytesSpilled)
          add("gc_time_ms", m.jvmGCTime)
          add("output_records", m.outputMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = action
      // listenerBus is private[spark]; poll until the queued TaskEnd
      // events drain (bounded wait keeps the helper deterministic enough)
      val deadline = System.nanoTime() + 5_000_000_000L
      var last = -1L
      while (System.nanoTime() < deadline && {
        val now = acc.synchronized(acc.values.sum)
        val changed = now != last; last = now; changed
      }) Thread.sleep(50)
      (a, acc.toMap)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
