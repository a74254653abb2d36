package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  test("salted two-phase agg equals plain agg on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"key${i % 7}" else "HOT", i.toLong))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"), buckets = 16,
        ("sum", "v", "sv"), ("count", "v", "n"), ("min", "v", "mn"), ("max", "v", "mx"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val plain = df.groupBy($"k")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"), min($"v"), max($"v"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join; phase-1 groups are actually spread") {
    import spark.implicits._
    val fact = (1 to 5000).map(i => (if (i % 5 == 0) i % 3 else 0, i.toLong)).toDF("k", "v")
    val dim = Seq((0, "hot"), (1, "one"), (2, "two")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
      .groupBy($"name").agg(sum($"v").as("sv")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = fact.join(dim, "k")
      .groupBy($"name").agg(sum($"v").as("sv")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    // the hot key's fact rows carry >1 distinct salt (the point of salting)
    val saltSpread = fact.filter($"k" === 0)
      .withColumn("_salt", pmod(xxhash64(fact.columns.map(col): _*), lit(8)))
      .select(countDistinct($"_salt")).collect().head.getLong(0)
    assert(saltSpread > 1)
  }

  test("hot-isolated join: exact rows on co-bucketed tables, zero-Exchange cold branch") {
    import spark.implicits._
    val root = "/tmp/graft-test/skewjoin"
    val factLoc = s"$root/fact"; val dimLoc = s"$root/dim"
    Seq(factLoc, dimLoc).foreach { l =>
      val p = new org.apache.hadoop.fs.Path(l)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.conf.set("spark.sql.catalog.skewcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.skewcat.root", root)
    // Zipf: half the fact rows land on key 0; a null-keyed row rides
    // along to pin inner-join null semantics through both branches
    Snapshots.commitAppend((1L to 20000L)
      .map(i => (if (i % 2 == 0) 0L else i % 97L, i))
      .toDF("k", "pay")
      .union(Seq((null.asInstanceOf[java.lang.Long], -1L))
        .toDF("k", "pay").as[(Option[Long], Long)].toDF("k", "pay")), factLoc)
    Snapshots.commitAppend((0L to 96L).map(i => (i, s"d$i")).toDF("k", "dv"), dimLoc)
    BucketLayout.commitBucketed(spark, factLoc, Seq("k"), Seq(4))
    BucketLayout.commitBucketed(spark, dimLoc, Seq("k"), Seq(4))
    val fact = spark.table("skewcat.fact")
    val dim = spark.table("skewcat.dim")
    // detection: the one dominant key, typed
    val hot = Skew.hotKeys(fact, "k", minShare = 0.25)
    assert(hot == Seq(0L), s"hot keys: $hot")
    val isolated = Skew.hotIsolatedJoin(fact, dim, "k", hot)
    val plain = fact.join(dim, Seq("k"))
    assert(isolated.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      plain.collect().map(_.toSeq).sortBy(_.toString).toSeq,
      "isolated join must return exactly the plain join's rows")
    // the cold branch keeps the storage-partitioned join: no Exchange
    // under its join; the hot branch is a broadcast join
    val phys = isolated.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"no broadcast branch:\n$phys")
    val cold = Skew.hotIsolatedJoin(fact, dim, "k", hot)
      .queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
        case s: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => s
      }
    cold.foreach { j =>
      val exchanges = j.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"cold branch must stay zero-Exchange (SPJ):\n$j")
    }
    // empty hot list degenerates to the plain join
    assert(Skew.hotIsolatedJoin(fact, dim, "k", Nil).count() == plain.count())
    // the table-name variant: same exact rows, and the HOT fact branch
    // reads UNGROUPED (the bucket_grouping=false per-read option routes
    // it through the parquet delegate for file-split parallelism) while
    // the three cold/dim scans stay on the bucket-reporting row scan
    val viaTables = Skew.hotIsolatedJoinTables(spark,
      "skewcat.fact", "skewcat.dim", "k", hot)
    assert(viaTables.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      plain.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // sparkPlan, not executedPlan: AQE wraps the executed tree and
    // collect() would not descend into the adaptive root
    val scans = viaTables.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
    }
    assert(scans.length == 4, s"expected 4 scans: $scans")
    assert(scans.count(_.contains("graft-snapshot-row-scan")) == 3,
      s"the hot fact branch must read through the ungrouped delegate: $scans")
  }

  test("graft_dot registers and evaluates via SQL; extensions wiring applies") {
    // getOrCreate reuses the active test session, so exercise the shared
    // builder through the session-registry path...
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect().head.getDouble(0)
    assert(r == 11.0)
    // ...and smoke-test that the SparkSessionExtensions hook wires cleanly
    new graft.functions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
  }
}
