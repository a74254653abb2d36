package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** CHECK constraints (ops/Constraints): add validates existing data,
  * every commit path gates NEW files on the predicates at the single
  * publish choke point, a violating commit aborts with no published
  * version (readers never see it), carried-by-reference publishes
  * (rollback, fork, compaction, layout) skip re-validation, and the SQL
  * surface (CALL add/drop_constraint, `t.constraints`, INSERT/UPDATE
  * through DSv2) hits the same gate. */
class ConstraintsSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/constraints"

  private def wipe(): Unit = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def table(name: String): String = {
    import spark.implicits._
    val loc = s"$root/$name"
    Snapshots.commitAppend(
      (1L to 50L).map(i => (i, i * 10)).toDF("id", "qty").repartition(2), loc)
    loc
  }

  test("violating append aborts pre-publish; valid append lands") {
    import spark.implicits._
    wipe()
    val loc = table("t1")
    Constraints.add(spark, loc, "qty_pos", "qty > 0")
    val e = intercept[IllegalStateException] {
      Snapshots.commitAppend(Seq((99L, -5L)).toDF("id", "qty"), loc)
    }
    assert(e.getMessage.contains("qty_pos"))
    assert(Snapshots.latestVersion(spark, loc) == 1L, "bad commit published")
    assert(Snapshots.read(spark, loc).count() == 50L)
    assert(Snapshots.commitAppend(Seq((99L, 5L)).toDF("id", "qty"), loc) == 2L)
    // the aborted commit's orphan data is swept like any crashed commit
    val (_, deleted) = Snapshots.expire(spark, loc, retainLast = 2, orphanGraceMs = 0L)
    assert(deleted > 0, "aborted commit's orphan files not swept")
    assert(Snapshots.read(spark, loc).count() == 51L)
  }

  test("add validates existing rows and refuses when violated") {
    import spark.implicits._
    wipe()
    val loc = s"$root/t2"
    Snapshots.commitAppend(Seq((1L, -1L)).toDF("id", "qty"), loc)
    intercept[IllegalStateException](
      Constraints.add(spark, loc, "qty_pos", "qty > 0"))
    assert(Constraints.list(spark, loc).isEmpty, "refused add left state behind")
  }

  test("concurrent adds compose (CAS chain); a failed add rolls back ONLY its entry") {
    import spark.implicits._
    wipe()
    val loc = table("t2c")
    // racing editors: two threads add different constraints N times over —
    // the versioned CAS chain means a lost race re-reads and re-applies,
    // so BOTH entries always land (the old single-file overwrite-by-
    // replace could silently lose one)
    (0 until 6).foreach { round =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fa = pool.submit(new Runnable {
          def run(): Unit =
            Constraints.add(spark, loc, s"a$round", s"qty > ${-round - 1}")
        })
        val fb = pool.submit(new Runnable {
          def run(): Unit =
            Constraints.add(spark, loc, s"b$round", s"id > ${-round - 1}")
        })
        fa.get(); fb.get()
      } finally pool.shutdown()
      val names = Constraints.list(spark, loc).map(_._1).toSet
      assert(names.contains(s"a$round") && names.contains(s"b$round"),
        s"a racing add was silently lost in round $round: $names")
      Constraints.drop(spark, loc, s"a$round")
      Constraints.drop(spark, loc, s"b$round")
    }
    // failed-add rollback is a re-read-then-remove of exactly its own
    // entry — a gate added while the doomed validation scan was running
    // must survive the rollback
    Constraints.add(spark, loc, "keeper", "id > 0")
    intercept[IllegalStateException](
      Constraints.add(spark, loc, "doomed", "qty > 100000"))
    assert(Constraints.list(spark, loc).map(_._1) == Seq("keeper"),
      "failed add clobbered the surviving constraint set")
    // ...and the keeper still gates commits
    intercept[IllegalStateException](
      Snapshots.commitAppend(Seq((-1L, 5L)).toDF("id", "qty"), loc))
    assert(Snapshots.read(spark, loc).count() == 50L)
  }

  test("UPDATE re-validates rewritten rows; MoR delete skips (no new files)") {
    wipe()
    val loc = table("t3")
    Constraints.add(spark, loc, "qty_cap", "qty <= 1000")
    intercept[IllegalStateException](
      Snapshots.commitUpdate(spark, loc, col("id") === 7L,
        Map("qty" -> org.apache.spark.sql.functions.lit(9999L))))
    assert(Snapshots.latestVersion(spark, loc) == 1L)
    // a DV-only delete introduces no files — gate is a no-op, commit lands
    assert(Snapshots.commitDeleteMoR(spark, loc, col("id") === 3L) == 2L)
  }

  test("carried publishes skip the gate: rollback resurfaces pre-constraint rows") {
    import spark.implicits._
    wipe()
    val loc = s"$root/t4"
    Snapshots.commitAppend(Seq((1L, -1L)).toDF("id", "qty"), loc)   // v1: bad rows
    Snapshots.commitReplace(Seq((2L, 5L)).toDF("id", "qty"), loc)   // v2: clean
    Constraints.add(spark, loc, "qty_pos", "qty > 0")               // holds on v2
    // documented semantics: constraints gate WRITES, not history
    assert(Snapshots.rollback(spark, loc, 1L) == 3L)
    assert(Snapshots.read(spark, loc).head().getLong(1) == -1L)
    // compaction of a clean table under a constraint also skips the gate
    Snapshots.rollback(spark, loc, 2L)
    assert(Snapshots.commitCompaction(spark, loc) == 5L)
  }

  test("WAP: branch writes validate at fast-forward against the parent's gate") {
    import spark.implicits._
    wipe()
    val loc = table("t5")
    Constraints.add(spark, loc, "qty_pos", "qty > 0")
    Refs.createBranch(spark, loc, "audit") // fork skips (carried)
    val bl = Refs.branchLoc(loc, "audit")
    // the branch has no constraint file of its own: staging bad rows works
    Snapshots.commitAppend(Seq((99L, -5L)).toDF("id", "qty"), bl)
    // ...but PUBLISH is where the parent's gate applies
    intercept[IllegalStateException](Refs.fastForward(spark, loc, "audit"))
    assert(Snapshots.latestVersion(spark, loc) == 1L)
  }

  test("a violating streaming epoch fails before publishing; the table is intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    wipe()
    val loc = table("t7")
    Constraints.add(spark, loc, "qty_pos", "qty > 0")
    spark.conf.set("spark.sql.catalog.ckcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcat.root", root)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF().select(col("value").as("id"), (-col("value")).as("qty"))
      .writeStream.option("checkpointLocation", s"$root/t7_ckpt")
      .toTable("ckcat.t7")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { mem.addData(5L); q.processAllAvailable() } finally q.stop()
    }
    assert(e.getMessage.contains("qty_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("qty_pos")))
    assert(Snapshots.latestVersion(spark, loc) == 1L, "violating epoch published")
    assert(Snapshots.read(spark, loc).count() == 50L)
  }

  test("CREATE TABLE TBLPROPERTIES check.<name> declares the gate at birth") {
    wipe()
    spark.conf.set("spark.sql.catalog.ckcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcat.root", root)
    spark.sql("""CREATE TABLE ckcat.t0 (id BIGINT, qty BIGINT)
                |TBLPROPERTIES ('check.qty_pos' = 'qty > 0')""".stripMargin)
    intercept[Exception](spark.sql("INSERT INTO ckcat.t0 VALUES (1, -1)"))
    spark.sql("INSERT INTO ckcat.t0 VALUES (1, 1)")
    assert(spark.sql("SELECT count(*) FROM ckcat.t0").head().getLong(0) == 1L)
  }

  test("SQL surface: CALL add_constraint gates INSERT; metadata table lists it") {
    wipe()
    import spark.implicits._
    table("t6")
    spark.conf.set("spark.sql.catalog.ckcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcat.root", root)
    spark.sql("CALL ckcat.system.add_constraint('t6', 'qty_pos', 'qty > 0')")
    val got = spark.sql("SELECT name, predicate FROM ckcat.t6.constraints")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("qty_pos", "qty > 0")))
    val e = intercept[Exception](
      spark.sql("INSERT INTO ckcat.t6 VALUES (99, -5)"))
    assert(e.getMessage.contains("qty_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("qty_pos")))
    assert(spark.sql("SELECT count(*) FROM ckcat.t6").head().getLong(0) == 50L)
    spark.sql("INSERT INTO ckcat.t6 VALUES (99, 5)")
    assert(spark.sql("SELECT count(*) FROM ckcat.t6").head().getLong(0) == 51L)
    spark.sql("CALL ckcat.system.drop_constraint('t6', 'qty_pos')")
    spark.sql("INSERT INTO ckcat.t6 VALUES (100, -1)") // gate removed
    assert(spark.sql("SELECT count(*) FROM ckcat.t6").head().getLong(0) == 52L)
  }
}
