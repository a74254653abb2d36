package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, concat, lit}

import graft.SparkTestBase
import graft.ops.{Refs, Snapshots}

/** Branches, tags, and write-audit-publish over the snapshot manifest
  * log (graft.ops.Refs): fork is metadata-only, branch DML never touches
  * the parent, fast-forward publishes by reference under the parent's
  * CAS rules, a diverged parent refuses the publish, expire honors tag
  * pins and cross-ref liveness in both directions, and the SQL surface
  * (`\`t#branch\`` identifiers, VERSION AS OF '<tag>', CALL verbs,
  * `t.refs` metadata) drives the whole cycle. */
class SnapshotRefsSpec extends SparkTestBase {

  private val root = "/tmp/graft-test/refs"

  private def wipe(): Unit = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.refcat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.refcat.root", root)
  }

  private def table(name: String, n: Long = 100L): String = {
    import spark.implicits._
    val loc = s"$root/$name"
    Snapshots.commitAppend(
      (1L to n).map(i => (i, s"v$i")).toDF("id", "v").repartition(4), loc)
    loc
  }

  private def ids(loc: String): Set[Long] =
    Snapshots.read(spark, loc).select("id").collect().map(_.getLong(0)).toSet

  test("branch forks metadata-only; branch DML leaves the parent untouched") {
    wipe()
    val loc = table("t1")
    val fork = Refs.createBranch(spark, loc, "audit")
    assert(fork == 1L)
    // fork wrote ONE manifest and zero data files
    val bl = Refs.branchLoc(loc, "audit")
    assert(Snapshots.read(spark, bl).inputFiles.toSet ==
      Snapshots.read(spark, loc).inputFiles.toSet)
    import spark.implicits._
    Snapshots.commitDelete(spark, bl,
      org.apache.spark.sql.functions.col("id") <= 50L)
    Snapshots.commitAppend(
      Seq((1000L, "new")).toDF("id", "v"), bl)
    assert(ids(bl) == ((51L to 100L).toSet + 1000L))
    assert(ids(loc) == (1L to 100L).toSet, "parent saw branch writes")
  }

  test("fast-forward publishes the audited state as one parent commit") {
    wipe()
    val loc = table("t2")
    Refs.createBranch(spark, loc, "audit")
    val bl = Refs.branchLoc(loc, "audit")
    import spark.implicits._
    Snapshots.commitAppend(Seq((500L, "staged")).toDF("id", "v"), bl)
    val v = Refs.fastForward(spark, loc, "audit")
    assert(v == 2L)
    assert(ids(loc) == (1L to 100L).toSet + 500L)
    // idempotent retry returns the same landed version
    assert(Refs.fastForward(spark, loc, "audit") == 2L)
    assert(Snapshots.lineage(spark, loc).isEmpty) // lineage reads v1, not v2
  }

  test("a parent that advanced past the fork refuses the publish") {
    wipe()
    val loc = table("t3")
    Refs.createBranch(spark, loc, "audit")
    import spark.implicits._
    Snapshots.commitAppend(Seq((600L, "branchside")).toDF("id", "v"),
      Refs.branchLoc(loc, "audit"))
    Snapshots.commitAppend(Seq((700L, "mainside")).toDF("id", "v"), loc)
    val e = intercept[IllegalStateException](Refs.fastForward(spark, loc, "audit"))
    assert(e.getMessage.contains("advanced"))
    assert(ids(loc) == (1L to 100L).toSet + 700L, "refused publish mutated parent")
  }

  test("parent expire keeps files a branch still references (fork carry)") {
    wipe()
    val loc = table("t4")
    Refs.createBranch(spark, loc, "audit")
    import spark.implicits._
    // parent REPLACES everything: without branch liveness the v1 files die
    Snapshots.commitReplace(
      (200L to 210L).map(i => (i, s"r$i")).toDF("id", "v"), loc)
    Snapshots.expire(spark, loc, retainLast = 1, orphanGraceMs = 0L)
    // the branch (forked at v1) still reads the original rows
    assert(ids(Refs.branchLoc(loc, "audit")) == (1L to 100L).toSet)
  }

  test("drop_branch keeps fast-forwarded files, deletes the rest") {
    wipe()
    val loc = table("t5")
    Refs.createBranch(spark, loc, "audit")
    val bl = Refs.branchLoc(loc, "audit")
    import spark.implicits._
    Snapshots.commitAppend(Seq((500L, "blessed")).toDF("id", "v"), bl)
    Refs.fastForward(spark, loc, "audit")
    // a second branch whose files are never published
    Refs.createBranch(spark, loc, "scratch")
    Snapshots.commitAppend(Seq((900L, "doomed")).toDF("id", "v"),
      Refs.branchLoc(loc, "scratch"))
    val keptPublished = Refs.dropBranch(spark, loc, "audit")
    assert(keptPublished > 0, "published files must survive their branch")
    assert(ids(loc) == (1L to 100L).toSet + 500L, "drop_branch broke the parent")
    val keptScratch = Refs.dropBranch(spark, loc, "scratch")
    assert(keptScratch == 0)
    val f = new Path(s"$loc/_branches/scratch")
    assert(!f.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(f))
    assert(Refs.listBranches(spark, loc).isEmpty)
  }

  test("drop_branch keeps files a SIBLING branch still references (post-expire)") {
    wipe()
    import spark.implicits._
    val loc = table("t5s")
    // branch 'a' lands a file under ITS data dir; fast-forward publishes
    // it into the parent by reference
    Refs.createBranch(spark, loc, "a")
    Snapshots.commitAppend(Seq((500L, "shared")).toDF("id", "v"),
      Refs.branchLoc(loc, "a"))
    Refs.fastForward(spark, loc, "a")
    // branch 'b' forks at the published state — its v1 carries a's file
    // BY REFERENCE
    Refs.createBranch(spark, loc, "b")
    // the parent moves on: an overwrite drops a's file from the parent's
    // live set, and expire forgets the manifests that named it (the file
    // itself survives via branchRefs — cross-ref liveness)
    Snapshots.commitReplace(Seq((1L, "only")).toDF("id", "v"), loc)
    Snapshots.expire(spark, loc, retainLast = 1, orphanGraceMs = Long.MaxValue)
    assert(ids(Refs.branchLoc(loc, "b")) == (1L to 100L).toSet + 500L,
      "expire must keep files branch manifests still reference")
    // dropping 'a' must NOT delete the shared file: no PARENT manifest
    // names it anymore, but sibling b's fork carry still reads it —
    // liveness is parent ∪ other branches, both directions
    Refs.dropBranch(spark, loc, "a")
    assert(ids(Refs.branchLoc(loc, "b")) == (1L to 100L).toSet + 500L,
      "drop_branch deleted a file a sibling branch still reads")
  }

  test("tags pin versions through expire; immutable until dropped") {
    wipe()
    val loc = table("t6")
    assert(Refs.tag(spark, loc, "stable") == 1L)
    intercept[IllegalStateException](Refs.tag(spark, loc, "stable"))
    import spark.implicits._
    (1 to 3).foreach { i =>
      Snapshots.commitReplace(Seq((i.toLong, "x")).toDF("id", "v"), loc)
    }
    Snapshots.expire(spark, loc, retainLast = 1, orphanGraceMs = 0L)
    // v1 survived only because the tag pinned it
    assert(ids(loc) == Set(3L))
    assert(Snapshots.read(spark, loc, 1L).count() == 100L)
    assert(Refs.tagVersion(spark, loc, "stable").contains(1L))
    Refs.dropTag(spark, loc, "stable")
    Snapshots.expire(spark, loc, retainLast = 1, orphanGraceMs = 0L)
    intercept[NoSuchElementException](Snapshots.read(spark, loc, 1L))
  }

  test("SQL surface: CALL branch / DML on `t#branch` / fast_forward / refs / AS OF tag") {
    wipe(); register()
    import spark.implicits._
    table("t7")
    spark.sql("CALL refcat.system.tag('t7', 'fork_point')")
    spark.sql("CALL refcat.system.branch('t7', 'audit')")
    spark.sql("INSERT INTO refcat.`t7#audit` VALUES (500, 'staged')")
    spark.sql("DELETE FROM refcat.`t7#audit` WHERE id <= 99")
    // audit: the branch holds the candidate state, main is untouched
    assert(spark.sql("SELECT count(*) c FROM refcat.`t7#audit`")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) c FROM refcat.t7").head().getLong(0) == 100L)
    val refs = spark.sql("SELECT kind, name, version FROM refcat.t7.refs ORDER BY kind, name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(refs.map(r => (r._1, r._2)) ==
      Seq(("branch", "audit"), ("tag", "fork_point")))
    spark.sql("CALL refcat.system.fast_forward('t7', 'audit')")
    assert(spark.sql("SELECT count(*) c FROM refcat.t7").head().getLong(0) == 2L)
    // the tag still reads the pre-publish state by name
    assert(spark.sql("SELECT count(*) c FROM refcat.t7 VERSION AS OF 'fork_point'")
      .head().getLong(0) == 100L)
    spark.sql("CALL refcat.system.drop_branch('t7', 'audit')")
    assert(spark.sql("SELECT * FROM refcat.t7.refs WHERE kind='branch'").count() == 0L)
    // the publish's provenance is answerable from the history table
    assert(spark.sql(
      "SELECT lineage FROM refcat.t7.history WHERE version = 2")
      .head().getString(0).startsWith("publish:audit@v"))
  }

  test("branch expire keeps files the parent re-referenced via fast-forward") {
    wipe()
    val loc = table("t8")
    Refs.createBranch(spark, loc, "audit")
    val bl = Refs.branchLoc(loc, "audit")
    import spark.implicits._
    Snapshots.commitAppend(Seq((500L, "blessed")).toDF("id", "v"), bl)
    Refs.fastForward(spark, loc, "audit")
    // branch replaces its own state, then expires aggressively: the
    // blessed file is no longer referenced by any RETAINED branch
    // manifest, but the parent's publish still names it
    Snapshots.commitReplace(Seq((1L, "z")).toDF("id", "v"), bl)
    Snapshots.expire(spark, bl, retainLast = 1, orphanGraceMs = 0L)
    assert(ids(loc) == (1L to 100L).toSet + 500L,
      "branch expire deleted a parent-published file")
  }

  test("fork from a historical version; publish only lands after rollback to it") {
    import spark.implicits._
    wipe()
    val loc = table("t12", n = 20L)                                   // v1
    Snapshots.commitReplace(Seq((999L, "x")).toDF("id", "v"), loc)    // v2
    val fork = Refs.createBranch(spark, loc, "fixup", version = 1L)
    assert(fork == 1L)
    val bl = Refs.branchLoc(loc, "fixup")
    assert(ids(bl) == (1L to 20L).toSet, "fork did not read the pinned version")
    Snapshots.commitAppend(Seq((21L, "v21")).toDF("id", "v"), bl)
    // the parent sits at v2, past the fork base: publish refuses
    intercept[IllegalStateException](Refs.fastForward(spark, loc, "fixup"))
    // roll the parent back to the fork base: now the publish lands
    Snapshots.rollback(spark, loc, 1L)
    Refs.fastForward(spark, loc, "fixup")
    assert(ids(loc) == (1L to 21L).toSet)
  }

  test("streaming ingest lands on a branch; fast-forward publishes the epochs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    wipe(); register()
    val loc = table("t10", n = 10L)
    Refs.createBranch(spark, loc, "ingest")
    val ckpt = s"$root/t10_ckpt"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    // the branch identifier resolves through the SAME catalog path as a
    // table, so exactly-once streaming epochs append to the branch only
    val q = mem.toDF().select(col("value").as("id"),
        concat(lit("s"), col("value")).as("v"))
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("refcat.`t10#ingest`")
    try { mem.addData(100L, 101L); q.processAllAvailable() } finally q.stop()
    assert(ids(Refs.branchLoc(loc, "ingest")) == (1L to 10L).toSet ++ Set(100L, 101L))
    assert(ids(loc) == (1L to 10L).toSet, "epochs leaked into the parent")
    Refs.fastForward(spark, loc, "ingest")
    assert(ids(loc) == (1L to 10L).toSet ++ Set(100L, 101L))
    // regression: the streaming write records scheme-less manifest
    // spellings while listings are scheme-qualified — dropBranch must
    // normalize both sides or the parent-published epoch files are
    // deleted (permanent parent data loss)
    assert(Refs.dropBranch(spark, loc, "ingest") > 0,
      "published streamed files were not recognized as parent-live")
    assert(ids(loc) == (1L to 10L).toSet ++ Set(100L, 101L),
      "drop_branch deleted parent-published streamed files")
  }

  test("a branch's v1 is pinned through its own expire (fork state survives)") {
    import spark.implicits._
    wipe()
    val loc = table("t13", n = 5L)
    Refs.createBranch(spark, loc, "work")
    val bl = Refs.branchLoc(loc, "work")
    Snapshots.commitAppend(Seq((100L, "a")).toDF("id", "v"), bl)
    Snapshots.commitAppend(Seq((101L, "b")).toDF("id", "v"), bl)
    Snapshots.expire(spark, bl, retainLast = 1, orphanGraceMs = 0L)
    // v1 (the fork manifest) must survive: it holds the lineage and the
    // fork state fastForward and the refs metadata read
    assert(Refs.forkBase(spark, bl) == 1L)
    assert(Refs.refsMeta(spark, loc).count() == 1L)
    // the parent is still at the fork state, so the publish lands even
    // though the branch expired everything but its head and its v1
    Refs.fastForward(spark, loc, "work")
    assert(ids(loc) == (1L to 5L).toSet ++ Set(100L, 101L))
  }

  test("a fork carries the bucket layout: parent joins its branch shuffle-free") {
    import spark.implicits._
    wipe(); register()
    val loc = s"$root/t11"
    Snapshots.commitAppend(
      (1L to 200L).map(i => (i, i * 2)).toDF("id", "v").repartition(4), loc)
    spark.sql("CALL refcat.system.bucket('t11', 'id', 4)")
    Refs.createBranch(spark, loc, "b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        """SELECT a.id, a.v, b.v AS bv FROM refcat.t11 a
          |JOIN refcat.`t11#b` b ON a.id = b.id""".stripMargin)
      df.collect()
      var n = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case qe: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(qe.plan)
          case _ => ()
        }
        p.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      assert(n == 0, "fork dropped the layout:\n" + df.queryExecution.executedPlan)
      assert(df.count() == 200L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("branching a branch is refused; bad ref names are refused") {
    wipe()
    val loc = table("t9", n = 5L)
    Refs.createBranch(spark, loc, "audit")
    intercept[IllegalArgumentException](
      Refs.createBranch(spark, Refs.branchLoc(loc, "audit"), "nested"))
    intercept[IllegalArgumentException](Refs.createBranch(spark, loc, "a/b"))
    intercept[IllegalArgumentException](Refs.tag(spark, loc, "x y"))
    // all-digit tags would be unreadable (VERSION AS OF '7' resolves as
    // version 7, never the tag) — refused at creation
    intercept[IllegalArgumentException](Refs.tag(spark, loc, "7"))
  }
}
