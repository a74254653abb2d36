package graft.jobs

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical whole programs (SURVEY.md §2.10, §2.7): QuasiMonteCarlo pi,
  * DistCp-lite, and Chain composition. Registered in [[ProgramDriver]]
  * like the reference's `EX/ExampleDriver.java:39-73`.
  */
object Programs {

  /** QuasiMonteCarlo pi (`EX/QuasiMonteCarlo.java`): sample points from
    * the deterministic 2-D Halton sequence (bases 2, 3 — the reference
    * uses the same low-discrepancy sequence), count in-circle hits.
    * map = partition of the index space, reduce = two global sums; fully
    * deterministic, no RNG state. */
  def piQmc(spark: SparkSession, nSamples: Long): DataFrame = {
    import spark.implicits._
    def halton(index: Long, base: Int): Double = {
      var f = 1.0; var r = 0.0; var i = index
      while (i > 0) { f /= base; r += f * (i % base); i /= base }
      r
    }
    val inside = spark.range(1, nSamples + 1)
      .mapPartitions { idx =>
        var in = 0L; var n = 0L
        idx.foreach { i =>
          val x = halton(i, 2) - 0.5
          val y = halton(i, 3) - 0.5
          if (x * x + y * y <= 0.25) in += 1
          n += 1
        }
        Iterator((in, n))
      }.toDF("inside", "n")
    inside.agg(sum($"inside").as("n_inside"), sum($"n").as("n_total"))
      .select($"n_inside", $"n_total",
        ($"n_inside" * 4.0 / $"n_total").as("pi_est"))
  }

  /** DistCp-lite (`hadoop-tools/hadoop-distcp/.../DistCp.java:58`):
    * build the file listing as a Dataset, distribute the copies across
    * the cluster with foreachPartition, skip up-to-date targets when
    * `update` (the `-update` length-match heuristic, `DistCpSync`'s cheap
    * cousin). Returns (copied, skipped). */
  def distCpLite(spark: SparkSession, src: String, dst: String,
                 update: Boolean = false, numTasks: Int = 32): (Long, Long) = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf)
    val listing = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else {
        val rel = st.getPath.toString.stripPrefix(
          fs.makeQualified(srcPath).toString).stripPrefix("/")
        listing += ((st.getPath.toString, rel, st.getLen))
      }
    }
    walk(srcPath)
    val copied = spark.sparkContext.longAccumulator("distcp.copied")
    val skipped = spark.sparkContext.longAccumulator("distcp.skipped")
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val dstStr = dst
    val doUpdate = update
    listing.toSeq.toDS()
      .repartition(math.min(numTasks, math.max(listing.size, 1)))
      .foreachPartition { (it: Iterator[(String, String, Long)]) =>
        val c = serConf.value
        it.foreach { case (from, rel, len) =>
          val fromP = new Path(from)
          val toP = new Path(dstStr, rel)
          val sfs = fromP.getFileSystem(c)
          val dfs = toP.getFileSystem(c)
          val upToDate = doUpdate && dfs.exists(toP) &&
            dfs.getFileStatus(toP).getLen == len
          if (upToDate) skipped.add(1)
          else {
            FileUtil.copy(sfs, fromP, dfs, toP, false, true, c)
            copied.add(1)
          }
        }
      }
    (copied.value, skipped.value)
  }

  /** DistCh (`hadoop-tools/hadoop-extras/.../DistCh.java`): distributed
    * metadata change — chmod/chown/touch over a file tree, fanned out
    * with the same listing + foreachPartition pattern as [[distCpLite]].
    * `perm` is an octal string ("644"); None leaves it untouched.
    * Returns the number of paths changed. */
  def distCh(spark: SparkSession, root: String, perm: Option[String],
             mtime: Option[Long] = None, numTasks: Int = 32): Long = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val listing = scala.collection.mutable.ArrayBuffer[String]()
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      listing += st.getPath.toString
      if (st.isDirectory) walk(st.getPath)
    }
    walk(rootPath)
    val changed = spark.sparkContext.longAccumulator("distch.changed")
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    listing.toSeq.toDS()
      .repartition(math.min(numTasks, math.max(listing.size, 1)))
      .foreachPartition { (it: Iterator[String]) =>
        val c = serConf.value
        it.foreach { s =>
          val p = new Path(s)
          val pfs = p.getFileSystem(c)
          perm.foreach(o => pfs.setPermission(p,
            new org.apache.hadoop.fs.permission.FsPermission(
              Integer.parseInt(o, 8).toShort)))
          mtime.foreach(t => pfs.setTimes(p, t, -1))
          changed.add(1)
        }
      }
    changed.value
  }

  /** ChainMapper/ChainReducer (`lib/chain/Chain.java:50`): stage
    * composition fused in one task. In Spark, composing DataFrame
    * transforms IS the chain — lazy evaluation + whole-stage codegen fuse
    * the stages into one generated function, no intermediate
    * materialization (the reference passes KV pairs in memory between
    * chained mappers; codegen goes further and fuses the loops). */
  def chain(df: DataFrame, stages: (DataFrame => DataFrame)*): DataFrame =
    stages.foldLeft(df)((acc, f) => f(acc))
}

/** ProgramDriver analog (`EX/ExampleDriver.java:39`): name → entry point
  * registry for the canonical programs, runnable from one main. */
object ProgramDriver {
  val programs: Map[String, (SparkSession, Seq[String]) => Any] = Map(
    "pi" -> ((s, args) =>
      Programs.piQmc(s, args.headOption.map(_.toLong).getOrElse(1000000L)).collect()),
    "distcp" -> ((s, args) => Programs.distCpLite(s, args(0), args(1),
      update = args.contains("-update"))),
    "distch" -> ((s, args) => Programs.distCh(s, args(0),
      perm = args.lift(1))),
    "randomwriter" -> ((s, args) => Generators.randomWriter(s,
      args.headOption.map(_.toLong).getOrElse(1000000L))
      .write.mode("overwrite").format("noop").save()),
    "randomtextwriter" -> ((s, args) => Generators.randomTextWriter(s,
      args.headOption.map(_.toLong).getOrElse(10000L))
      .write.mode("overwrite").format("noop").save()),
    "wordcount" -> ((s, args) =>
      graft.SparkEntry.queries("wordcount")(s, args.head).collect()),
    "grep" -> ((s, args) =>
      graft.SparkEntry.queries("grep_count")(s, args.head).collect()),
    "sort" -> ((s, args) =>
      graft.SparkEntry.queries("total_sort")(s, args.head).collect()),
    "terasort" -> ((s, args) =>
      graft.SparkEntry.queries("terasort")(s, args.head).collect()),
  )

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    try {
      val name = args.headOption.getOrElse(
        sys.error(s"usage: ProgramDriver <${programs.keys.mkString("|")}> [args]"))
      programs(name)(spark, args.drop(1).toSeq)
    } finally spark.stop()
  }
}
