package graft.ops

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import scala.collection.concurrent.TrieMap

/** Hadoop Streaming parity (reference: `STR/PipeMapRed.java:46` — fork the
  * user executable per task, pump `key \t value \n` lines over
  * stdin/stdout; `STR/PipeMapper.java:79-81` separator/key-field config;
  * stderr `reporter:counter:group,name,amount` protocol in
  * `PipeMapRed$MRErrorThread`).
  *
  * Implemented as `mapPartitions` with an explicit subprocess per
  * partition (SURVEY.md §2.9: the one place imperative per-partition code
  * is the right Spark answer). A writer thread pumps input lines while the
  * task thread consumes stdout — same two-thread design as the reference,
  * avoiding pipe-buffer deadlock. stderr is drained on a third thread and
  * `reporter:counter:` lines feed Spark `LongAccumulator`s (the reference's
  * Counters surface, SURVEY.md §2.3).
  */
object Pipes {

  // keyed by (context, group, name): a (group, name)-only key could hand
  // back an accumulator registered on an earlier, stopped SparkContext
  private val counterRegistry =
    TrieMap.empty[(org.apache.spark.SparkContext, String), LongAccumulator]

  /** Get-or-create a named accumulator (counters surface). Accumulators
    * are serialized into the task closure, so counter updates work on a
    * real cluster, not just local mode. */
  def counter(spark: SparkSession, group: String, name: String): LongAccumulator =
    counterRegistry.getOrElseUpdate((spark.sparkContext, s"$group,$name"), {
      val acc = spark.sparkContext.longAccumulator(s"$group:$name")
      acc
    })

  private val CounterLine = """^reporter:counter:([^,]*),([^,]*),(-?\d+)\s*$""".r

  /** Run every line of `df`'s single string column through `cmd` (one
    * subprocess per partition); returns the subprocess stdout lines.
    * `counters` maps "group,name" → accumulator for the stderr
    * `reporter:counter:` protocol. */
  def pipe(df: DataFrame, cmd: Seq[String], env: Map[String, String] = Map.empty,
      counters: Map[String, LongAccumulator] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val piped = df.select(col(df.columns.head).cast("string")).as[String]
      .mapPartitions { lines => runSubprocess(lines, cmd, env, counters) }
    piped.toDF("line")
  }

  /** StreamJob analog (`STR/StreamJob.java:80`): mapper cmd → shuffle on
    * the first `numKeyFields` tab-fields → key-sorted partitions → reducer
    * cmd. The reducer subprocess sees key-sorted lines and does its own
    * group-break detection — the exact reference contract (§3.2). */
  def streamJob(df: DataFrame, mapperCmd: Seq[String], reducerCmd: Seq[String],
      numPartitions: Int, numKeyFields: Int = 1, sep: String = "\t",
      counters: Map[String, LongAccumulator] = Map.empty): DataFrame = {
    val mapped = pipe(df, mapperCmd, counters = counters)
    val arr = split(col("line"), java.util.regex.Pattern.quote(sep))
    val keys = (0 until numKeyFields).map(i => get(arr, lit(i)))
    val sorted = mapped
      .repartition(numPartitions, keys: _*)
      .sortWithinPartitions(keys.map(_.asc) :+ col("line").asc: _*)
    pipe(sorted, reducerCmd, counters = counters)
  }

  /** typed-bytes pipe mode (`-io typedbytes`; framing in
    * [[TypedBytes]], reference `STR/PipeMapRed.java` + `typedbytes/
    * TypedBytesInput.java`): the first two columns become binary
    * (key, value) typed-bytes pairs on the child's stdin; the child
    * emits typed-bytes pairs back. This convenience shape decodes to
    * (key string, value long) — the canonical streaming KV; use
    * [[pipeTypedBytesRaw]] for arbitrary nested payloads. */
  def pipeTypedBytes(df: DataFrame, cmd: Seq[String],
      env: Map[String, String] = Map.empty,
      counters: Map[String, LongAccumulator] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { rows =>
      runSubprocessTypedBytes(rows.map(r => (r.get(0), r.get(1))), cmd, env, counters)
        .map { case (k, v) =>
          (k.asInstanceOf[String], v match {
            case l: Long => l
            case i: Int => i.toLong
            case b: Byte => b.toLong
            case other => throw new IllegalArgumentException(
              s"expected integral typed-bytes value, got $other")
          })
        }
    }.toDF("key", "value")
  }

  /** Arbitrary typed-bytes pairs through a subprocess, re-encoded to raw
    * frames per pair so any nesting (VECTOR/LIST/MAP) survives the
    * Dataset boundary; decode with [[TypedBytes.readPairOpt]]. */
  def pipeTypedBytesRaw(df: DataFrame, cmd: Seq[String],
      env: Map[String, String] = Map.empty,
      counters: Map[String, LongAccumulator] = Map.empty): org.apache.spark.sql.Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { rows =>
      runSubprocessTypedBytes(rows.map(r => (r.get(0), r.get(1))), cmd, env, counters)
        .map { kv =>
          val bos = new java.io.ByteArrayOutputStream()
          TypedBytes.writePair(new java.io.DataOutputStream(bos), kv)
          bos.toByteArray
        }
    }
  }

  /** The two-pump-thread subprocess loop (PipeMapRed's design). */
  private def runSubprocess(lines: Iterator[String], cmd: Seq[String],
      env: Map[String, String],
      counters: Map[String, LongAccumulator]): Iterator[String] = {
    if (!lines.hasNext) return Iterator.empty
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val writeErr = new AtomicReference[Throwable]()

    val stdin = new BufferedWriter(new OutputStreamWriter(
      proc.getOutputStream, StandardCharsets.UTF_8))
    val writer = new Thread(() => {
      try {
        lines.foreach { l => stdin.write(l); stdin.write('\n') }
        stdin.close()
      } catch { case t: Throwable => writeErr.set(t); proc.destroy() }
    }, "graft-pipe-stdin")
    writer.setDaemon(true); writer.start()

    startStderrDrain(proc, counters)

    val stdout = new BufferedReader(new InputStreamReader(
      proc.getInputStream, StandardCharsets.UTF_8))
    new Iterator[String] {
      private var nextLine: String = stdout.readLine()
      def hasNext: Boolean = {
        if (nextLine == null) {
          val code = proc.waitFor()
          if (writeErr.get() != null) throw writeErr.get()
          if (code != 0)
            throw new RuntimeException(s"pipe command ${cmd.mkString(" ")} exited $code")
        }
        nextLine != null
      }
      def next(): String = {
        val l = nextLine; nextLine = stdout.readLine(); l
      }
    }
  }

  /** Binary twin of [[runSubprocess]]: typed-bytes pairs in, typed-bytes
    * pairs out, same writer/stderr thread design. */
  private def runSubprocessTypedBytes(pairs: Iterator[(Any, Any)],
      cmd: Seq[String], env: Map[String, String],
      counters: Map[String, LongAccumulator]): Iterator[(Any, Any)] = {
    if (!pairs.hasNext) return Iterator.empty
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val writeErr = new AtomicReference[Throwable]()

    val stdin = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(proc.getOutputStream))
    val writer = new Thread(() => {
      try {
        pairs.foreach(TypedBytes.writePair(stdin, _))
        stdin.close()
      } catch { case t: Throwable => writeErr.set(t); proc.destroy() }
    }, "graft-pipe-tb-stdin")
    writer.setDaemon(true); writer.start()

    startStderrDrain(proc, counters)

    val stdout = new java.io.DataInputStream(
      new java.io.BufferedInputStream(proc.getInputStream))
    new Iterator[(Any, Any)] {
      private var nextPair: Option[(Any, Any)] = TypedBytes.readPairOpt(stdout)
      def hasNext: Boolean = {
        if (nextPair.isEmpty) {
          val code = proc.waitFor()
          if (writeErr.get() != null) throw writeErr.get()
          if (code != 0)
            throw new RuntimeException(s"pipe command ${cmd.mkString(" ")} exited $code")
        }
        nextPair.nonEmpty
      }
      def next(): (Any, Any) = {
        val p = nextPair.get; nextPair = TypedBytes.readPairOpt(stdout); p
      }
    }
  }

  /** stderr drain thread: counter protocol lines feed accumulators,
    * everything else echoes to task stderr (PipeMapRed$MRErrorThread). */
  private def startStderrDrain(proc: Process,
      counters: Map[String, LongAccumulator]): Unit = {
    val stderrThread = new Thread(() => {
      val err = new BufferedReader(new InputStreamReader(
        proc.getErrorStream, StandardCharsets.UTF_8))
      var line = err.readLine()
      while (line != null) {
        line match {
          case CounterLine(group, name, amount) =>
            counters.get(s"$group,$name").foreach(_.add(amount.toLong))
          case other => System.err.println(s"[pipe stderr] $other")
        }
        line = err.readLine()
      }
    }, "graft-pipe-stderr")
    stderrThread.setDaemon(true); stderrThread.start()
  }
}
