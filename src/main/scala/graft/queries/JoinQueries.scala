package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Ops._

/** Join surface (SURVEY.md §2.4). The reference implements joins three
  * ways — map-side sort-merge over pre-sorted inputs
  * (`lib/join/CompositeInputFormat.java:56`), reduce-side tagged join
  * (`hadoop-tools/hadoop-datajoin/.../DataJoinReducerBase.java:230`), and
  * map-side hash join via DistributedCache (`CORE/mapreduce/Job.java:1088`).
  * All three collapse to declarative `join`: Catalyst picks SortMergeJoin /
  * ShuffledHashJoin for big-big and BroadcastHashJoin for small dims
  * (dimension tables here are ≤ a few thousand rows — always broadcast,
  * which is exactly the DistributedCache pattern made automatic).
  */
object JoinQueries {

  /** TPC-H Q3-shaped 3-way inner join + agg + top-k. customer is small →
    * broadcast; orders⋈lineitem shuffles on the join key once and the
    * groupBy reuses that key (no extra exchange on o_orderkey). */
  private def joinInner(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp_ntz"))
    val revenue = cents(col("l_extendedprice")) *
      (lit(100) - round(col("l_discount") * 100).cast("long"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(revenue) / 10000.0).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").as("order_date"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  private val joinInnerSql: String = {
    val rev = s"${sqlCents("l_extendedprice")}*(100-${sqlCents("l_discount")})"
    s"""SELECT o_orderkey, sum($rev)/10000.0 AS revenue,
       |  CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate  > TIMESTAMP '1997-01-01'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin
  }

  /** Full-outer n-way join (`lib/join/OuterJoinRecordReader.java:34`):
    * emit a tuple if ANY source has the key, missing slots null. */
  private def joinOuter(s: SparkSession, d: String): DataFrame = {
    val custPerNation = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
    val suppPerNation = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
    custPerNation.join(suppPerNation, Seq("nationkey"), "full_outer")
      .orderBy(col("nationkey"))
  }

  /** Override join (`lib/join/OverrideRecordReader.java:42`): per key, the
    * value from the RIGHTMOST source that has it — full outer + coalesce
    * right-to-left (SURVEY.md §7.3 decision table). Sources: customer
    * balance overridden by a "corrections" feed derived from orders. */
  private def joinOverride(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("custkey"), col("c_acctbal").as("bal_base"))
    // Rightmost source: customers with >=1 URGENT order get bal from there.
    val overrideSrc = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("custkey"))
      .agg((max(cents(col("o_totalprice"))) / 100.0).as("bal_override"))
    base.join(overrideSrc, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("bal_override"), col("bal_base")).as("bal"))
      .orderBy(col("custkey"))
  }

  private val joinOverrideSql: String =
    s"""SELECT COALESCE(b.custkey, o.custkey) AS custkey,
       |  COALESCE(o.bal_override, b.bal_base) AS bal
       |FROM (SELECT c_custkey AS custkey, c_acctbal AS bal_base FROM customer) b
       |FULL OUTER JOIN (
       |  SELECT o_custkey AS custkey,
       |    max(${sqlCents("o_totalprice")})/100.0 AS bal_override
       |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o
       |ON b.custkey = o.custkey
       |ORDER BY custkey""".stripMargin

  /** Left-semi join — EXISTS (beyond-reference built-in, SURVEY.md §2.4
    * "not present in reference"): customers that placed an URGENT order. */
  private def joinSemi(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join — NOT EXISTS: customers with no URGENT order. */
  private def joinAnti(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** The hot-isolated skew join as a registry row
    * ([[graft.ops.Skew.hotIsolatedJoinTables]]): a Zipf fact (every
    * third order collapses onto key 0) co-bucketed with its dim; the
    * detected hot key's rows join against a broadcast of the dim's
    * matching row while the cold mass keeps the zero-Exchange SPJ, and
    * the DuckDB oracle certifies the result equals the plain join —
    * the probe suite carries the >= 2x un-straggle claim, this row
    * carries the exactness. */
  private def joinSkewIsolated(s: SparkSession, d: String): DataFrame = {
    val root = "/tmp/graft-warehouse/snapcat_dml"
    val factLoc = s"$root/orders_skf"; val dimLoc = s"$root/orders_skd"
    Seq(factLoc, dimLoc).foreach { l =>
      val p = new org.apache.hadoop.fs.Path(l)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    s.conf.set("spark.sql.catalog.graft_snap_dml",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_snap_dml.root", root)
    val o = Tables.orders(s, d)
    graft.ops.Snapshots.commitAppend(o.select(
      when(col("o_orderkey") % 3 === 0, 0L)
        .otherwise(pmod(col("o_custkey"), lit(97L))).as("k"),
      col("o_orderkey"),
      cents(col("o_totalprice")).as("price_cents")), factLoc)
    graft.ops.Snapshots.commitAppend(
      s.range(0L, 97L).toDF("k")
        .select(col("k"), concat(lit("d"), col("k")).as("tag")), dimLoc)
    graft.ops.BucketLayout.commitBucketed(s, factLoc, Seq("k"), Seq(4))
    graft.ops.BucketLayout.commitBucketed(s, dimLoc, Seq("k"), Seq(4))
    val hot = graft.ops.Skew.hotKeys(
      s.table("graft_snap_dml.orders_skf"), "k", minShare = 0.2)
    require(hot == Seq(0L), s"hot-key detection found $hot")
    graft.ops.Skew.hotIsolatedJoinTables(s,
        "graft_snap_dml.orders_skf", "graft_snap_dml.orders_skd", "k", hot)
      .groupBy(col("k"), col("tag"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("sum_cents"))
      .orderBy(col("k"))
  }

  private def joinSkewIsolatedSql: String =
    s"""WITH fact AS (
       |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 0
       |              ELSE o_custkey % 97 END AS k,
       |    ${sqlCents("o_totalprice")} AS price_cents
       |  FROM orders),
       |dim AS (SELECT unnest(range(0, 97)) AS k)
       |SELECT f.k, 'd' || CAST(d.k AS VARCHAR) AS tag,
       |  count(*) AS n_orders,
       |  CAST(sum(price_cents) AS BIGINT) AS sum_cents
       |FROM fact f JOIN dim d ON f.k = d.k
       |GROUP BY f.k, d.k
       |ORDER BY f.k""".stripMargin

  /** Theta (non-equi) join — the datajoin contrib's custom-predicate
    * `combine()` generalization: bucket events by value range against a
    * small broadcast ranges table → BroadcastNestedLoopJoin. */
  private def joinTheta(s: SparkSession, d: String): DataFrame = {
    val buckets = s.createDataFrame(Seq(
      ("tiny", 0.0, 10.0), ("small", 10.0, 25.0), ("mid", 25.0, 50.0),
      ("large", 50.0, 100.0), ("huge", 100.0, 1e18)))
      .toDF("bucket", "lo", "hi")
    Tables.events(s, d)
      .join(broadcast(buckets), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy(col("bucket"))
  }

  private val joinThetaSql: String =
    s"""SELECT bucket, count(*) AS n, sum(${sqlCents("value")})/100.0 AS sum_value
       |FROM events JOIN (VALUES
       |  ('tiny', 0.0, 10.0), ('small', 10.0, 25.0), ('mid', 25.0, 50.0),
       |  ('large', 50.0, 100.0), ('huge', 100.0, 1e18)) AS b(bucket, lo, hi)
       |ON value >= lo AND value < hi
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Secondary sort (`EX/SecondarySort.java:57`): partition by natural key,
    * values arrive sorted by secondary key. Window row_number is the
    * declarative equivalent (partition ≙ FirstPartitioner, order ≙
    * setSortComparatorClass); deterministic via full tiebreak. */
  private def secondarySort(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** TPC-H Q5-shaped 5-way star join: fact ⋈ two shuffle keys with three
    * broadcast dims chained. At 100 TB: lineitem⋈orders and ⋈supplier
    * shuffle on their keys; customer/nation/region broadcast (nation and
    * region are bounded; customer would flip to shuffle at scale — AQE
    * decides from runtime sizes). */
  private def joinStar5(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz"))
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val revenue = cents(col("l_extendedprice")) *
      (lit(100) - round(col("l_discount") * 100).cast("long"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(revenue) / 10000.0).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  private val joinStar5Sql: String = {
    val rev = s"${sqlCents("l_extendedprice")}*(100-${sqlCents("l_discount")})"
    s"""SELECT n_name, sum($rev)/10000.0 AS revenue, count(*) AS n_items
       |FROM lineitem, orders, supplier, customer, nation
       |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
       |  AND o_custkey = c_custkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |GROUP BY n_name ORDER BY n_name""".stripMargin
  }

  /** Window-function analytics (beyond-reference; the closest reference
    * machinery is secondary sort §2.4): per-customer order sequence with
    * lag deltas, running totals, and rank. One shuffle on the partition
    * key serves all four window functions. */
  private def windowFunctions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_c"))
      .withColumn("rk", rank().over(
        Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
      .withColumn("prev_price_c", lag(col("price_c"), 1).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
      .withColumn("run_sum_c", sum(col("price_c")).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("o_custkey"), col("o_orderkey"), col("rk"),
        (col("price_c") / 100.0).as("price"),
        (col("prev_price_c") / 100.0).as("prev_price"),
        (col("run_sum_c") / 100.0).as("run_sum"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val windowFunctionsSql: String = {
    val pc = sqlCents("o_totalprice")
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS INT) AS rk,
       |  $pc/100.0 AS price,
       |  (lag($pc, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey))/100.0 AS prev_price,
       |  (sum($pc) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
       |     ROWS UNBOUNDED PRECEDING))/100.0 AS run_sum
       |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
  }

  /** As-of join (ops.AsOfJoin — the temporal operator Spark lacks): each
    * click matched to the same user's most recent prior purchase. Oracle
    * = DuckDB's native ASOF JOIN, so the merge-formulation semantics are
    * checked against a reference implementation of the operator. */
  private def joinAsof(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(max(cents(col("value"))).as("pval_c"))
      .select(col("user_id"), col("pts"), col("pval_c"))
    graft.ops.AsOfJoin.join(clicks, purchases, key = "user_id",
        leftTime = "ts", rightTime = "pts", valueCols = Seq("pts", "pval_c"))
      .orderBy(col("event_id"))
  }

  private val joinAsofSql: String =
    s"""WITH p AS (SELECT user_id, ts AS pts,
       |             max(${sqlCents("value")}) AS pval_c
       |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
       |SELECT c.event_id, c.user_id, c.ts,
       |  p.pts AS asof_pts, p.pval_c AS asof_pval_c
       |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.pts
       |ORDER BY c.event_id""".stripMargin

  /** Range join (ops.RangeJoin): event value-cents against overlapping
    * integer intervals, bucket-equi-join formulation — shuffle-hash on
    * the bucket key, exact residual filter, no nested-loop product.
    * Interval set derived deterministically in both engines. */
  private def joinRange(s: SparkSession, d: String): DataFrame = {
    val points = Tables.events(s, d)
      .select(col("event_id"), cents(col("value")).as("v_c"))
    val intervals = s.range(0, 200)
      .select(col("id").as("iv_id"), (col("id") * 37).as("lo"),
        (col("id") * 37 + 55).as("hi"))
    graft.ops.RangeJoin.pointInInterval(points, "v_c", intervals, "lo", "hi",
        bucketWidth = 64)
      .groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("sum_v_c"))
      .orderBy(col("iv_id"))
  }

  private val joinRangeSql: String =
    s"""WITH iv AS (SELECT i AS iv_id, i * 37 AS lo, i * 37 + 55 AS hi
       |            FROM range(0, 200) t(i)),
       |p AS (SELECT event_id, ${sqlCents("value")} AS v_c FROM events)
       |SELECT iv_id, count(*) AS n, CAST(sum(v_c) AS BIGINT) AS sum_v_c
       |FROM p JOIN iv ON v_c >= lo AND v_c < hi
       |GROUP BY iv_id ORDER BY iv_id""".stripMargin

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems below 50%
    * of their part's average quantity. Catalyst decorrelates this into
    * an aggregate + join — the SQL surface the reference never had
    * (users hand-wrote two MR jobs for this). */
  private def subqueryCorrelated(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_li_sq")
    s.sql(
      s"""SELECT l_partkey, count(*) AS n_small,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |FROM graft_li_sq l1
         |WHERE l_quantity * 2 < (
         |  SELECT avg(l_quantity) FROM graft_li_sq l2
         |  WHERE l2.l_partkey = l1.l_partkey)
         |GROUP BY l_partkey
         |ORDER BY l_partkey""".stripMargin)
  }

  private val subqueryCorrelatedSql: String =
    """SELECT l_partkey, count(*) AS n_small,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem l1
      |WHERE l_quantity * 2 < (
      |  SELECT avg(l_quantity) FROM lineitem l2
      |  WHERE l2.l_partkey = l1.l_partkey)
      |GROUP BY l_partkey
      |ORDER BY l_partkey""".stripMargin

  /** TPC-H Q19 shape: disjunction of conjunctive brand/quantity bands.
    * Catalyst extracts the common l_partkey=p_partkey conjunct for the
    * join and pushes the OR-of-ANDs residual — the predicate-
    * normalization work the reference's users did by hand across
    * multiple map functions. */
  private def joinDisjunctive(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val bands =
      (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#12" && col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#23" && col("l_quantity").between(20, 35))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey") && bands)
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"))
  }

  private val joinDisjunctiveSql: String =
    s"""SELECT count(*) AS n, sum(${sqlCents("l_extendedprice")}) / 100.0 AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey AND (
       |  (p_brand = 'Brand#1'  AND l_quantity BETWEEN 1  AND 15) OR
       |  (p_brand = 'Brand#12' AND l_quantity BETWEEN 10 AND 25) OR
       |  (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 35))""".stripMargin

  /** Typed cogroup (KeyValueGroupedDataset.cogroup) — the Dataset face
    * of the reference's reduce-side tagged join (`DataJoinReducerBase
    * .java:230`: both inputs shuffled by key, one reducer call sees the
    * tagged value groups): orders and lineitem co-grouped per orderkey,
    * reconciling header totals against line sums in one pass. Per-key
    * state is the two small groups (≤1 order, ≤7 lines); cents math
    * keeps the output oracle-exact. */
  private def cogroupReconcile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("c"))
      .as[(Long, Long)]
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), cents(col("l_extendedprice")).as("c"))
      .as[(Long, Long)]
    o.groupByKey(_._1).cogroup(li.groupByKey(_._1)) { (k, os, ls) =>
      var no = 0L; var so = 0L
      os.foreach { t => no += 1; so += t._2 }
      var nl = 0L; var sl = 0L
      ls.foreach { t => nl += 1; sl += t._2 }
      Iterator((k, no, nl, so, sl))
    }.toDF("o_orderkey", "n_orders", "n_lines", "order_cents", "line_cents")
      .orderBy(col("o_orderkey"))
  }

  private val cogroupReconcileSql =
    """SELECT COALESCE(o.k, l.k) AS o_orderkey,
      |  COALESCE(o.n, 0) AS n_orders, COALESCE(l.n, 0) AS n_lines,
      |  COALESCE(o.s, 0) AS order_cents, COALESCE(l.s, 0) AS line_cents
      |FROM (SELECT o_orderkey AS k, count(*) AS n,
      |        CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS s
      |      FROM orders GROUP BY 1) o
      |FULL JOIN (SELECT l_orderkey AS k, count(*) AS n,
      |        CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS s
      |      FROM lineitem GROUP BY 1) l ON o.k = l.k
      |ORDER BY o_orderkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("cogroup_reconcile", cogroupReconcile, Some(cogroupReconcileSql)),
    Q("join_inner", joinInner, Some(joinInnerSql)),
    Q("join_star5", joinStar5, Some(joinStar5Sql)),
    Q("join_asof", joinAsof, Some(joinAsofSql)),
    Q("join_range", joinRange, Some(joinRangeSql)),
    Q("subquery_correlated", subqueryCorrelated, Some(subqueryCorrelatedSql)),
    Q("join_disjunctive", joinDisjunctive, Some(joinDisjunctiveSql)),
    Q("window_functions", windowFunctions, Some(windowFunctionsSql)),
    Q("join_outer", joinOuter,
      Some("""SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, n_cust, n_supp
             |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
             |      FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
             |      FROM supplier GROUP BY 1) s
             |ON c.nationkey = s.nationkey
             |ORDER BY nationkey""".stripMargin)),
    Q("join_override", joinOverride, Some(joinOverrideSql)),
    Q("join_semi", joinSemi,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),
    Q("join_anti", joinAnti,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),
    Q("join_theta", joinTheta, Some(joinThetaSql)),
    Q("join_skew_isolated", joinSkewIsolated, Some(joinSkewIsolatedSql)),
    Q("secondary_sort", secondarySort,
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             |  CAST(row_number() OVER (PARTITION BY o_custkey
             |       ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
             |FROM orders ORDER BY o_custkey, rn""".stripMargin)),
  )
}
