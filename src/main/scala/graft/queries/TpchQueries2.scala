package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import Ops.{cents, sqlCents}

/** The rest of the TPC-H-shaped family (round 9): Q1/Q4/Q6/Q8/Q9/Q11/
  * Q12/Q13/Q14/Q15/Q16/Q19/Q20/Q21/Q22 analogs on the driver's fixtures,
  * completing the composition tier [[TpchQueries]] opened (Q3/Q5/Q7/Q10/
  * Q17/Q18). "Analog" because the fixtures carry a reduced column set —
  * no partsupp relation, no commit/receipt dates, no comments — so each
  * query keeps its canonical PLAN SHAPE (the thing worth testing:
  * EXISTS-semi, double-negated anti, scalar subqueries, conditional
  * shares, left-join distributions, disjunctive pushdown) on the columns
  * that exist; the analog mapping is noted per query.
  *
  * Arithmetic policy as everywhere: money in integer cents ([[Ops]]),
  * quantities as exact longs, every ratio/average a SINGLE division of
  * exact integers — so all 15 hash-match their DuckDB mirrors including
  * top-k cutoffs and HAVING borderlines.
  */
object TpchQueries2 {

  private def rev4(price: Column, disc: Column) =
    cents(price) * (lit(100L) - cents(disc))
  private def sqlRev4(price: String, disc: String): String =
    s"${sqlCents(price)} * (100 - ${sqlCents(disc)})"
  private val qtyL = col("l_quantity").cast("long")
  private val sqlQtyL = "CAST(l_quantity AS BIGINT)"
  /** l_shipdate more than 60 days after its order's date — the fixture's
    * lateness analog of Q4/Q12/Q21's receipt-vs-commit comparison. */
  private val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
  private val sqlLate = "l_shipdate > o_orderdate + INTERVAL 60 DAY"

  /** Q1 — pricing summary: the canonical full-scan aggregate. Sums are
    * exact longs in 10⁻² (qty, base) / 10⁻⁴ (disc price) / 10⁻⁶ (charge)
    * units; averages divide the exact sum by the exact count once. One
    * scan, map-side partial agg, 4-group shuffle. */
  private def q1Pricing(s: SparkSession, d: String): DataFrame = {
    val q100 = round(col("l_quantity") * 100).cast("long")
    val p = cents(col("l_extendedprice"))
    val disc = cents(col("l_discount"))
    val tax = cents(col("l_tax"))
    Tables.lineitem(s, d).filter(col("l_shipdate") <= lit("2001-08-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(q100) / 100.0).as("sum_qty"),
        (sum(p) / 100.0).as("sum_base_price"),
        (sum(p * (lit(100L) - disc)) / 10000.0).as("sum_disc_price"),
        (sum(p * (lit(100L) - disc) * (lit(100L) + tax)) / 1000000.0).as("sum_charge"),
        (sum(q100) / (count(lit(1)) * 100.0)).as("avg_qty"),
        (sum(p) / (count(lit(1)) * 100.0)).as("avg_price"),
        (sum(disc) / (count(lit(1)) * 100.0)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1Sql: String = {
    val q100 = "CAST(round(l_quantity*100) AS BIGINT)"
    val p = sqlCents("l_extendedprice")
    val disc = sqlCents("l_discount")
    val tax = sqlCents("l_tax")
    s"""SELECT l_returnflag, l_linestatus,
       |  sum($q100) / 100.0 AS sum_qty,
       |  sum($p) / 100.0 AS sum_base_price,
       |  sum($p * (100 - $disc)) / 10000.0 AS sum_disc_price,
       |  sum($p * (100 - $disc) * (100 + $tax)) / 1000000.0 AS sum_charge,
       |  sum($q100) / (count(*) * 100.0) AS avg_qty,
       |  sum($p) / (count(*) * 100.0) AS avg_price,
       |  sum($disc) / (count(*) * 100.0) AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-01'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Q4 — order-priority checking: orders of one year having at least
    * one LATE line (EXISTS decorrelates to a left-semi join whose
    * condition spans both relations). */
  private def q4Priority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey") && late, "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql: String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |  AND EXISTS (SELECT 1 FROM lineitem
       |              WHERE l_orderkey = o_orderkey AND $sqlLate)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q6 — forecasting revenue change: the pure scan-aggregate (every
    * predicate pushes to the parquet scan; zero joins, one partial-agg
    * reduction to a single row). Revenue here is price × discount. */
  private def q6Forecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        cents(col("l_discount")).between(3L, 5L) &&
        col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
        / 10000.0).as("revenue"))

  private val q6Sql: String =
    s"""SELECT sum(${sqlCents("l_extendedprice")} * ${sqlCents("l_discount")})
       |    / 10000.0 AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND ${sqlCents("l_discount")} BETWEEN 3 AND 5
       |  AND l_quantity < 24""".stripMargin

  /** Q8 — market share: of the PROMO-part revenue sold into ASIA
    * customers over two years, the share supplied BY ASIA suppliers,
    * per order year. nation and region each join twice (role-playing
    * dims, all broadcast); the share is a single division of two exact
    * longs from one conditional aggregation. */
  private def q8Market(s: SparkSession, d: String): DataFrame = {
    val asiaNations = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val c = Tables.customer(s, d)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supAsia = Tables.supplier(s, d)
      .join(broadcast(asiaNations.withColumnRenamed("n_nationkey", "sn")),
        col("s_nationkey") === col("sn"))
      .select(col("s_suppkey").as("asia_sk"))
    val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    Tables.lineitem(s, d)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supAsia), col("l_suppkey") === col("asia_sk"), "left")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("asia_sk").isNotNull,
          rev4(col("l_extendedprice"), col("l_discount"))).otherwise(0L)).as("num"),
        sum(rev4(col("l_extendedprice"), col("l_discount"))).as("den"))
      .select(col("o_year"),
        (col("num").cast("double") / col("den").cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Sql: String =
    s"""WITH asia AS (
       |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA')
       |SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |  CAST(sum(CASE WHEN s_nationkey IN (SELECT n_nationkey FROM asia)
       |        THEN ${sqlRev4("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(${sqlRev4("l_extendedprice", "l_discount")}) AS DOUBLE)
       |    AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE c_nationkey IN (SELECT n_nationkey FROM asia)
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q9 — product-type profit: amount = revenue − retail cost (the
    * fixture's cost analog: p_retailprice × quantity), per supplier
    * nation per order year over 'widget' parts. Both terms exact in
    * 10⁻⁴ units; one division at the end. */
  private def q9Profit(s: SparkSession, d: String): DataFrame = {
    val widget = Tables.part(s, d).filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice"))
    val amount4 = rev4(col("l_extendedprice"), col("l_discount")) -
      cents(col("p_retailprice")) * lit(100L) * qtyL
    Tables.lineitem(s, d)
      .join(broadcast(widget), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(amount4) / 10000.0).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |  sum(${sqlRev4("l_extendedprice", "l_discount")}
       |      - ${sqlCents("p_retailprice")} * 100 * $sqlQtyL) / 10000.0
       |    AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin

  /** Q11 — important stock: per-part traded value through NATION_3's
    * suppliers, kept where above 0.48 % of the nation's total (the
    * global scalar joins back as a broadcast 1-row relation; the
    * HAVING borderline compares exact integers, no division). */
  private def q11Value(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(s, d)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice")) * qtyL).as("v4"))
    val total = perPart.agg(sum(col("v4")).as("t4"))
    perPart.crossJoin(broadcast(total))
      .filter(col("v4") * 10000L > col("t4") * 48L)
      .select(col("l_partkey"), (col("v4") / 100.0).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  private val q11Sql: String =
    s"""WITH v AS (
       |  SELECT l_partkey, sum(${sqlCents("l_extendedprice")} * $sqlQtyL) AS v4
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_3'
       |  GROUP BY 1)
       |SELECT l_partkey, v4 / 100.0 AS value
       |FROM v WHERE v4 * 10000 > (SELECT sum(v4) FROM v) * 48
       |ORDER BY value DESC, l_partkey""".stripMargin

  /** Q12 — shipping-mode priority: lines of one order year classed
    * LATE/ONTIME (the fixture's shipmode analog), counting high- vs
    * low-priority orders per class — the conditional two-counter
    * aggregation. */
  private def q12LateClass(s: SparkSession, d: String): DataFrame = {
    val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(late, "LATE").otherwise("ONTIME").as("ship_class"))
      .agg(sum(when(highPri, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(highPri, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  private val q12Sql: String =
    s"""SELECT CASE WHEN $sqlLate THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q13 — customer order-count distribution: LEFT join so zero-order
    * customers survive into the c_count = 0 bucket, then the
    * distribution-of-a-distribution second aggregation. */
  private def q13CustDist(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY 1) t
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14 — promotion effect: the percentage of one month's revenue from
    * PROMO-type parts — conditional numerator over the same aggregate,
    * one division of two exact longs. */
  private def q14Promo(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01") &&
        col("l_shipdate") < lit("1997-10-01"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          rev4(col("l_extendedprice"), col("l_discount"))).otherwise(0L)).as("num"),
        sum(rev4(col("l_extendedprice"), col("l_discount"))).as("den"))
      .select((col("num").cast("double") * 100.0 / col("den").cast("double"))
        .as("promo_revenue"))

  private val q14Sql: String =
    s"""SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
       |      THEN ${sqlRev4("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE)
       |    * 100.0
       |    / CAST(sum(${sqlRev4("l_extendedprice", "l_discount")}) AS DOUBLE)
       |    AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
       |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  /** Q15 — top supplier: quarterly revenue per supplier, keep the
    * max-revenue supplier(s) via a broadcast scalar max — the view +
    * scalar-subquery shape. Ties are impossible to mis-handle: the
    * comparison is on the exact integer. */
  private def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev4(col("l_extendedprice"), col("l_discount"))).as("r4"))
    val top = rev.agg(max(col("r4")).as("m4"))
    rev.crossJoin(broadcast(top)).filter(col("r4") === col("m4"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("r4") / 10000.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    sum(${sqlRev4("l_extendedprice", "l_discount")}) AS r4
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, r4 / 10000.0 AS total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE r4 = (SELECT max(r4) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** Q16 — supplier relationship counting: distinct suppliers per
    * (brand, type, size) over non-PROMO parts excluding one brand, with
    * negative-balance suppliers (the complaints analog) removed by an
    * anti join BEFORE the distinct count. */
  private def q16SupplierCnt(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_type") =!= "PROMO" && col("p_brand") =!= "Brand#5")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val excluded = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO' AND p_brand <> 'Brand#5'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q19 — discounted revenue, disjunctive predicate: three
    * brand × quantity × size conjunct groups OR'd — the classic
    * "extract the common partkey equi-join, evaluate the residual
    * disjunction post-join" plan. */
  private def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val clause =
      (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
        col("p_size").between(1, 5)) ||
      (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
        col("p_size").between(1, 10)) ||
      (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
        col("p_size").between(1, 15))
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .agg((sum(rev4(col("l_extendedprice"), col("l_discount"))) / 10000.0)
        .as("revenue"))
  }

  private val q19Sql: String =
    s"""SELECT sum(${sqlRev4("l_extendedprice", "l_discount")}) / 10000.0 AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
       |        AND p_size BETWEEN 1 AND 5)
       |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
       |        AND p_size BETWEEN 1 AND 10)
       |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
       |        AND p_size BETWEEN 1 AND 15)""".stripMargin

  /** Q20 — potential part promotion: suppliers who moved more than 400
    * units of PROMO parts in 1997 — the nested aggregate-then-semi-join
    * shape (inner GROUP BY + HAVING feeding an outer semi join). */
  private def q20Nested(s: SparkSession, d: String): DataFrame = {
    val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val movers = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")) === 1997)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(qtyL).as("q"))
      .filter(col("q") > 400L)
    Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy(col("s_suppkey"))
  }

  private val q20Sql: String =
    s"""SELECT s_suppkey, s_name FROM supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE p_type = 'PROMO' AND year(l_shipdate) = 1997
       |  GROUP BY 1 HAVING sum($sqlQtyL) > 400)
       |ORDER BY s_suppkey""".stripMargin

  /** Q21 — suppliers who kept orders waiting: late lines of finished
    * orders where OTHER suppliers participated but NONE of them was
    * late — the EXISTS + NOT-EXISTS double correlation, decorrelated
    * into one per-order (distinct suppliers, distinct late suppliers)
    * aggregate joined back; top 10 by exact count. */
  private def q21Waiting(s: SparkSession, d: String): DataFrame = {
    val lo = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late", late)
    val perOrder = lo.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("nl"))
    lo.filter(col("is_late"))
      .join(perOrder, col("l_orderkey") === col("ok"))
      .filter(col("ns") > 1L && col("nl") === 1L)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
      .select(col("s_name"), col("numwait"))
  }

  private val q21Sql: String =
    s"""WITH lo AS (
       |  SELECT l_orderkey, l_suppkey,
       |    CASE WHEN $sqlLate THEN 1 ELSE 0 END AS is_late
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F'),
       |po AS (
       |  SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS ns,
       |    count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS nl
       |  FROM lo GROUP BY 1)
       |SELECT s_name, count(*) AS numwait FROM (
       |  SELECT DISTINCT l_orderkey, l_suppkey
       |  FROM lo JOIN po ON l_orderkey = ok
       |  WHERE is_late = 1 AND ns > 1 AND nl = 1) w
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  /** Q22 — global sales opportunity: customers with above-average
    * positive balance and no order since 1999, counted per nation. The
    * average is compared WITHOUT division (bal·n > Σbal — exact longs),
    * the "no recent order" is an anti join. */
  private def q22Idle(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val bal = cents(col("c_acctbal"))
    val agg = c.filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("sbal"), count(lit(1)).as("nbal"))
    val active = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(agg))
      .filter(bal * col("nbal") > col("sbal"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), (sum(bal) / 100.0).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  private val q22Sql: String =
    s"""WITH agg AS (
       |  SELECT sum(${sqlCents("c_acctbal")}) AS sbal, count(*) AS nbal
       |  FROM customer WHERE c_acctbal > 0)
       |SELECT c_nationkey, count(*) AS numcust,
       |  sum(${sqlCents("c_acctbal")}) / 100.0 AS totacctbal
       |FROM customer, agg
       |WHERE ${sqlCents("c_acctbal")} * nbal > sbal
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '1999-01-01')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("tpch_q1_pricing", q1Pricing, Some(q1Sql)),
    Q("tpch_q4_priority", q4Priority, Some(q4Sql)),
    Q("tpch_q6_forecast", q6Forecast, Some(q6Sql)),
    Q("tpch_q8_market", q8Market, Some(q8Sql)),
    Q("tpch_q9_profit", q9Profit, Some(q9Sql)),
    Q("tpch_q11_value", q11Value, Some(q11Sql)),
    Q("tpch_q12_lateclass", q12LateClass, Some(q12Sql)),
    Q("tpch_q13_custdist", q13CustDist, Some(q13Sql)),
    Q("tpch_q14_promo", q14Promo, Some(q14Sql)),
    Q("tpch_q15_topsupplier", q15TopSupplier, Some(q15Sql)),
    Q("tpch_q16_suppliercnt", q16SupplierCnt, Some(q16Sql)),
    Q("tpch_q19_disjunctive", q19Disjunctive, Some(q19Sql)),
    Q("tpch_q20_nested", q20Nested, Some(q20Sql)),
    Q("tpch_q21_waiting", q21Waiting, Some(q21Sql)),
    Q("tpch_q22_idle", q22Idle, Some(q22Sql)))
}
