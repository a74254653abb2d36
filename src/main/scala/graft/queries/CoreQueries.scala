package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Ops._

/** Scan / projection / aggregation / sort / distinct queries — the
  * MapReduce core surface (SURVEY.md §2.1–§2.3, §2.5, §2.6) expressed
  * Spark-first: declarative DataFrame plans so Catalyst handles predicate
  * pushdown, column pruning and partial aggregation (the reference has no
  * optimizer — the combiner at `CORE/mapred/MapTask.java:1581` is the only
  * "pushdown", and Spark's HashAggregate partial/final subsumes it).
  */
object CoreQueries {

  /** Projection+filter pushed to the parquet scan — subsumes
    * `lib/input/SequenceFileInputFilter.java` scan-time filters. */
  private def scanProjectFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  /** TPC-H Q1-shaped aggregation: the canonical "combiner + reducer" sum
    * pattern (`lib/reduce/LongSumReducer.java:30`, WordCount's
    * `IntSumReducer` `EX/WordCount.java:52`) over real money columns.
    * Partial aggregation is automatic (HashAggregateExec partial/final). */
  private def q1Agg(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
    val extC  = cents(col("l_extendedprice"))
    val discP = round(col("l_discount") * 100).cast("long")
    val taxP  = round(col("l_tax") * 100).cast("long")
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        (sum(extC) / 100.0).as("sum_base_price"),
        (sum(extC * (lit(100) - discP)) / 10000.0).as("sum_disc_price"),
        (sum(extC * (lit(100) - discP) * (lit(100) + taxP)) / 1000000.0).as("sum_charge"),
        (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(extC).cast("double") / (count(lit(1)) * 100.0)).as("avg_price"),
        (sum(discP).cast("double") / (count(lit(1)) * 100.0)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1AggSql: String = {
    val ext  = sqlCents("l_extendedprice")
    val disc = sqlCents("l_discount")
    val tax  = sqlCents("l_tax")
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       |  sum($ext)/100.0 AS sum_base_price,
       |  sum($ext*(100-$disc))/10000.0 AS sum_disc_price,
       |  sum($ext*(100-$disc)*(100+$tax))/1000000.0 AS sum_charge,
       |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)/count(*) AS avg_qty,
       |  CAST(sum($ext) AS DOUBLE)/(count(*)*100.0) AS avg_price,
       |  CAST(sum($disc) AS DOUBLE)/(count(*)*100.0) AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** WordCount (`EX/WordCount.java:36`): tokenize → explode → sum-by-key.
    * Map-side partial count ≙ the reference's combiner. */
  private def wordcount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  /** Grep program (`EX/Grep.java:40`): regex extract → count → sort desc.
    * The reference needs two MR jobs + a single reducer for the sort; here
    * it is one pipelined plan with TakeOrderedAndProject. */
  private val grepPattern = "(scan|join|sort|merge|filter|group)"
  private def grepCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(regexp_extract_all(col("text"), lit(grepPattern), lit(1))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))

  /** Total-order sort (`EX/Sort.java:57` + TotalOrderPartitioner):
    * `orderBy` = sample → range-exchange → per-partition sort, exactly the
    * reference's sampler+partitioner design but built-in. */
  private def totalSort(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Top-k (`EX/Grep.java:89-92` single-reducer idiom → better:
    * TakeOrderedAndProjectExec, no single-task bottleneck). */
  private def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Distinct (SURVEY.md §2.6 dedup idiom: map to (record,null) + identity
    * reduce → `dropDuplicates`). */
  private def distinctFlags(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** KeyValueTextInputFormat analog (`lib/input/KeyValueTextInputFormat
    * .java:47`): split each line at the first separator into (key, value). */
  private def kvText(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), substring_index(col("text"), " ", 1).as("k"), col("text"))
      .select(col("doc_id"), col("k"),
        expr("substring(text, length(k) + 2)").as("v"))
      .orderBy(col("doc_id"))

  /** Scan-throughput analog (TestDFSIO, `JCT/fs/TestDFSIO.java:87`):
    * full-width read of the fact table reduced to exact sums — measures
    * raw columnar scan + agg bandwidth with no shuffle beyond one row. */
  private def scanThroughput(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    l.agg(
      count(lit(1)).as("n"),
      sum(col("l_orderkey")).as("sum_okey"),
      sum(col("l_partkey")).as("sum_pkey"),
      sum(col("l_suppkey")).as("sum_skey"),
      sum(col("l_linenumber").cast("long")).as("sum_line"),
      sum(col("l_quantity").cast("long")).as("sum_qty"),
      sum(cents(col("l_extendedprice"))).as("sum_price_c"),
      sum(cents(col("l_discount"))).as("sum_disc_c"),
      sum(cents(col("l_tax"))).as("sum_tax_c"))
  }

  val all: Seq[Q] = Seq(
    Q("scan_throughput", scanThroughput,
      Some(s"""SELECT count(*) AS n,
              |  CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
              |  CAST(sum(l_partkey) AS BIGINT) AS sum_pkey,
              |  CAST(sum(l_suppkey) AS BIGINT) AS sum_skey,
              |  CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_line,
              |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              |  CAST(sum(${sqlCents("l_extendedprice")}) AS BIGINT) AS sum_price_c,
              |  CAST(sum(${sqlCents("l_discount")}) AS BIGINT) AS sum_disc_c,
              |  CAST(sum(${sqlCents("l_tax")}) AS BIGINT) AS sum_tax_c
              |FROM lineitem""".stripMargin)),
    Q("scan_project_filter", scanProjectFilter,
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-01-01'""".stripMargin)),
    Q("q1_agg", q1Agg, Some(q1AggSql)),
    Q("wordcount", wordcount,
      Some("""SELECT w AS word, count(*) AS cnt
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
             |WHERE w <> '' GROUP BY w ORDER BY word""".stripMargin)),
    Q("grep_count", grepCount,
      Some(s"""SELECT m AS term, count(*) AS cnt
              |FROM (SELECT unnest(regexp_extract_all(text, '$grepPattern', 1)) AS m
              |      FROM documents) t
              |GROUP BY m ORDER BY cnt DESC, term""".stripMargin)),
    Q("total_sort", totalSort,
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    Q("topk_orders", topkOrders,
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),
    Q("distinct_flags", distinctFlags,
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    Q("kv_text", kvText,
      Some("""SELECT doc_id, string_split(text, ' ')[1] AS k,
             |  substring(text, length(string_split(text, ' ')[1]) + 2) AS v
             |FROM documents ORDER BY doc_id""".stripMargin)),
  )
}
