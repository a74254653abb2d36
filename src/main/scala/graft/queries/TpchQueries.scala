package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import Ops.{cents, sqlCents}

/** TPC-H-shaped multi-operator analytics (Q3/Q5/Q7/Q17 analogs on the
  * driver's TPC-H-ish fixtures) — the composition tier above the
  * single-operator registry rows: multi-way join ordering, broadcast
  * dimension picks, semi-correlated aggregation, and top-k under AQE in
  * ONE plan each, the warehouse shapes a real user runs end-to-end.
  *
  * All money arithmetic follows the integer-cents policy ([[Ops]]):
  * revenue = Σ cents(extendedprice) · (100 − discount%) is an exact
  * BIGINT in 10⁻⁴ currency units divided exactly once at the end, so
  * every query hash-matches its DuckDB mirror bit-for-bit (including
  * the top-k cutoffs, which order by the exact integer, never the
  * divided double).
  *
  * Scale notes per query are on each def; the common spine: lineitem is
  * the only corpus-sized relation, every dimension is broadcast-sized
  * or pre-filtered before its join, and each aggregation partial-aggs
  * map-side before its one shuffle.
  */
object TpchQueries {

  /** Exact revenue numerator in 10⁻⁴ units: cents × (100 − disc%). */
  private def rev4(price: org.apache.spark.sql.Column,
                   disc: org.apache.spark.sql.Column) =
    cents(price) * (lit(100L) - cents(disc))

  private def sqlRev4(price: String, disc: String): String =
    s"${sqlCents(price)} * (100 - ${sqlCents(disc)})"

  /** Q3 analog — shipping-priority top-10: segment-filtered customers ⋈
    * date-filtered orders ⋈ date-filtered lineitem, revenue per order,
    * top 10 by exact revenue. The segment filter prunes customer BEFORE
    * its broadcast; the two date filters are pushed to the scans
    * (PushedFilters); the top-k is TakeOrderedAndProject on the exact
    * integer — no global sort materializes. */
  private def q3Shipping(s: SparkSession, d: String): DataFrame = {
    val cut = "1998-06-01"
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d).filter(col("o_orderdate") < lit(cut))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit(cut))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(sum(rev4(col("l_extendedprice"), col("l_discount"))).as("r4"))
      .orderBy(col("r4").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("order_date"), (col("r4") / 10000.0).as("revenue"))
  }

  private val q3Sql: String =
    s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       |  sum(${sqlRev4("l_extendedprice", "l_discount")}) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-01'
       |  AND l_shipdate > TIMESTAMP '1998-06-01'
       |GROUP BY 1, 2
       |ORDER BY sum(${sqlRev4("l_extendedprice", "l_discount")}) DESC, o_orderkey
       |LIMIT 10""".stripMargin

  /** Q5 analog — local-supplier volume per nation in one region: the
    * 6-relation chain (region → nation → customer/supplier → orders →
    * lineitem) with the LOCAL constraint c_nationkey = s_nationkey
    * folded into the join. region/nation/supplier broadcast; the only
    * shuffles are lineitem⋈orders and the final 5-group agg. */
  private def q5Local(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d).join(
        Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(s, d).join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        rev4(col("l_extendedprice"), col("l_discount")).as("r4"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("r4")) / 10000.0).as("revenue"))
      .orderBy(col("n_name"))
  }

  private val q5Sql: String =
    s"""SELECT n_name,
       |  sum(${sqlRev4("l_extendedprice", "l_discount")}) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY 1 ORDER BY n_name""".stripMargin

  /** Q7 analog — bilateral trade volume: supplier-nation × customer-
    * nation revenue by ship year between two nations, both directions.
    * The nation table joins TWICE (both broadcast) — the classic
    * role-playing dimension; grouping is (2 × 2 × years) rows. */
  private def q7Volume(s: SparkSession, d: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_7")
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("ship_year"),
        rev4(col("l_extendedprice"), col("l_discount")).as("r4"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sk"))
      .join(broadcast(n2), col("c_nationkey") === col("ck"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg((sum(col("r4")) / 10000.0).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  private val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS ship_year,
       |  sum(${sqlRev4("l_extendedprice", "l_discount")}) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Q17 analog — small-quantity revenue for one brand: the correlated
    * "below 20% of this part's average quantity" predicate decorrelated
    * into a per-part aggregate joined back. The comparison runs in
    * exact integers (qty < 0.2·avg ⟺ 5·q100·n < Σq100 — no division,
    * no FP), so even the borderline rows agree across engines. Per-part
    * stats partial-agg before their one shuffle; the brand filter
    * prunes part before broadcast. */
  private def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val q100 = round(col("l_quantity") * 100).cast("long")
    val pa = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("n"), sum(q100).as("sq"))
    val brand = Tables.part(s, d).filter(col("p_brand") === "Brand#9")
      .select(col("p_partkey"))
    Tables.lineitem(s, d)
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      .join(pa, col("l_partkey") === col("pk"))
      .filter(lit(5L) * q100 * col("n") < col("sq"))
      .agg(count(lit(1)).as("n_small"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("total_price"))
  }

  private val q17Sql: String =
    s"""WITH pa AS (
       |  SELECT l_partkey AS pk, count(*) AS n,
       |    sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq
       |  FROM lineitem GROUP BY 1)
       |SELECT count(*) AS n_small,
       |  sum(${sqlCents("l_extendedprice")}) / 100.0 AS total_price
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN pa ON l_partkey = pa.pk
       |WHERE p_brand = 'Brand#9'
       |  AND 5 * CAST(round(l_quantity * 100) AS BIGINT) * n < sq""".stripMargin

  /** Q10 analog — returned-item reporting: revenue lost to 'R'-flagged
    * items in one quarter, per customer with nation, top 20. The
    * returnflag + quarter filters are pushed to the scans, cutting
    * lineitem and orders BEFORE their join; customer joins the
    * already-aggregable stream and nation broadcasts last (25 rows onto
    * 20-ish groups). Top-k on the exact integer revenue. */
  private def q10Returns(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(rev4(col("l_extendedprice"), col("l_discount"))).as("r4"))
      .orderBy(col("r4").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        (col("r4") / 10000.0).as("revenue"))
  }

  private val q10Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  sum(${sqlRev4("l_extendedprice", "l_discount")}) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-04-01'
       |GROUP BY 1, 2, 3
       |ORDER BY sum(${sqlRev4("l_extendedprice", "l_discount")}) DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** Q18 analog — large-volume customers: orders whose total quantity
    * exceeds 300, joined back to customer. The HAVING relation is tiny
    * (top ~0.3% of orders) and integral; no broadcast hint — at test SF
    * AQE turns the join to broadcast on its own, and at warehouse scale
    * (where 0.3% of orders outgrows the driver) the same plan degrades
    * gracefully to a shuffle join instead of OOMing on a forced hint.
    * Quantities are integral doubles — cast to long so both engines sum
    * exact integers. */
  private def q18BigOrders(s: SparkSession, d: String): DataFrame = {
    val qty = col("l_quantity").cast("long")
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("big_ok"))
      .agg(sum(qty).as("total_qty"))
      .filter(col("total_qty") > 300L)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    o.join(big, col("o_orderkey") === col("big_ok"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("order_date"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  private val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey AS big_ok,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
      |SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, total_qty
      |FROM orders
      |JOIN big ON o_orderkey = big_ok
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  def all: Seq[Q] = Seq(
    Q("tpch_q3_shipping", q3Shipping, Some(q3Sql)),
    Q("tpch_q5_local", q5Local, Some(q5Sql)),
    Q("tpch_q7_volume", q7Volume, Some(q7Sql)),
    Q("tpch_q10_returns", q10Returns, Some(q10Sql)),
    Q("tpch_q17_smallqty", q17SmallQty, Some(q17Sql)),
    Q("tpch_q18_bigorders", q18BigOrders, Some(q18Sql)))
}
