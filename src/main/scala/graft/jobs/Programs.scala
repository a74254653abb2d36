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

  /** The iterated-division Halton factor sequence `f₁=1/base,
    * fₖ=fₖ₋₁/base` as round-trip double literals — each step ROUNDS
    * (base 3 is not dyadic), so an oracle must replay the identical
    * rounded values, not `base^-k`. One definition feeds both the Spark
    * loop above (same arithmetic) and the DuckDB mirror's inlined
    * literals, so the two can never diverge. Scala's `Double.toString`
    * is shortest-round-trip: DuckDB parses each literal back to the
    * exact same bits. */
  def haltonFactorLiterals(base: Int, k: Int): Seq[String] = {
    var f = 1.0
    (0 until k).map { _ => f /= base; f.toString }
  }

  /** Integer-EXACT certificate twin of [[piQmc]]: the same 2-D Halton
    * sampling QUANTIZED to a dyadic/triadic grid — x to 15 base-2 digits
    * (a = Σ bitₖ(i)·2^(14−k), the bit-reversal = ⌊rad₂(i)·2^15⌋) and y to
    * 9 base-3 digits (b = ⌊rad₃(i)·3^9⌋) — with the in-circle test done
    * in PURE INT64 arithmetic: with x̂ = a/2^15, ŷ = b/3^9,
    * (x̂−½)²+(ŷ−½)² ≤ ¼  ⇔  (2a−2^15)²·3^18 + (2b−3^9)²·2^30 ≤ 2^30·3^18
    * (max term ~8.4e17, inside int64). No floating point anywhere, so a
    * DuckDB oracle hash-compares the hit count and the Σa/Σb coordinate
    * digests exactly — driver-certifying the distributed Halton indexing
    * the double-precision [[piQmc]] (rows-only; ProgramsSpec pins its
    * accuracy) shares. Same exact-regime-twin pattern as
    * `knn_ann_ivf_exh`. */
  def piQmcGrid(spark: SparkSession, nSamples: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, sum}
    val rhs = 1073741824L * 387420489L // 2^30 * 3^18
    spark.range(1, nSamples + 1)
      .mapPartitions { idx =>
        idx.map { i =>
          var a = 0L; var k = 0
          while (k < 15) { a += ((i >> k) & 1L) << (14 - k); k += 1 }
          var b = 0L; var p = 1L; var q = 6561L; var m = 0
          while (m < 9) { b += ((i / p) % 3) * q; p *= 3; q /= 3; m += 1 }
          val dx = 2 * a - 32768L
          val dy = 2 * b - 19683L
          val in =
            if (dx * dx * 387420489L + dy * dy * 1073741824L <= rhs) 1L else 0L
          (in, a, b)
        }
      }.toDF("in", "a", "b")
      .agg(sum($"in").as("n_inside"), count(lit(1)).as("n_total"),
        sum($"a").as("sum_a"), sum($"b").as("sum_b"))
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

  /** BBP π digit extraction (reference: `EX/pi/DistBbp.java` computes
    * distributed π bits with a BBP-family formula): the hex digits of π
    * starting at fractional position `d`, WITHOUT computing earlier
    * digits. Σ_k 16^(d-k) mod (8k+j) terms are embarrassingly parallel
    * over k; each term's fractional part is converted to 62-bit
    * FIXED-POINT, and wrap-around addition is exact arithmetic mod 1 —
    * associative and commutative, so the distributed sum is
    * deterministic under any partitioning/ordering (a double-precision
    * sum would be neither). */
  def bbpPiHex(spark: SparkSession, d: Long, digits: Int = 8): String = {
    require(digits <= 12, "fixed-point carries ~48 reliable bits")
    val MASK = (1L << 62) - 1
    // (num * 2^62) / m with BigInt intermediates (m can exceed 2^31)
    def fixedFrac(num: Long, m: Long): Long =
      ((BigInt(num) << 62) / BigInt(m)).toLong
    def modpow16(e: Long, m: Long): Long = {
      var r = BigInt(1); val b = BigInt(16); var ee = e
      var acc = b.mod(BigInt(m))
      while ({ if ((ee & 1) == 1) r = (r * acc).mod(BigInt(m)); ee >>= 1; ee > 0 })
        acc = (acc * acc).mod(BigInt(m))
      r.toLong
    }
    // BBP: π = Σ_k 1/16^k (4/(8k+1) − 2/(8k+4) − 1/(8k+5) − 1/(8k+6))
    def termSum(k: Long): Long = {
      var s = 0L
      def add(coef: Long, j: Long): Unit = {
        val m = 8 * k + j
        val t = fixedFrac(modpow16(d - k, m), m)
        val c = (coef.abs * t) & MASK
        s = (if (coef > 0) s + c else s - c) & MASK
      }
      add(4, 1); add(-2, 4); add(-1, 5); add(-1, 6)
      s
    }
    import spark.implicits._
    // per-partition exact wrap-sums, folded on the driver (numPartitions
    // tiny longs — not data)
    val partials = spark.range(0, d + 1)
      .mapPartitions { ks =>
        var s = 0L
        ks.foreach { k => s = (s + termSum(k)) & MASK }
        Iterator(s)
      }.collect()
    var frac = partials.foldLeft(0L)((a, b) => (a + b) & MASK)
    // tail k > d: 16^(d-k) decays by 2^-4 per term — 16 extra terms reach
    // past the 48 reliable bits
    (1L to 16L).foreach { j =>
      val k = d + j
      def tail(coef: Long, jj: Long): Unit = {
        val m = 8 * k + jj
        val t = (math.pow(16.0, -j.toDouble) / m * (1L << 62).toDouble).toLong
        val c = (coef.abs * t) & MASK
        frac = (if (coef > 0) frac + c else frac - c) & MASK
      }
      tail(4, 1); tail(-2, 4); tail(-1, 5); tail(-1, 6)
    }
    val sb = new StringBuilder
    (0 until digits).foreach { _ =>
      sb.append("0123456789ABCDEF".charAt(((frac >> 58) & 0xF).toInt))
      frac = (frac << 4) & MASK
    }
    sb.toString
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
    "bbp" -> ((s, args) =>
      println(Programs.bbpPiHex(s, args.headOption.map(_.toLong).getOrElse(0L)))),
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
