package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Set operators, scan-time record filters, and the Logalyzer tool query
  * (SURVEY.md §2.6, §2.1 SequenceFileInputFilter, §2.10 Logalyzer).
  */
object MiscQueries {

  /** Intersect (reference idiom: tagged reduce-side join + membership
    * test, SURVEY.md §2.6 — built-in `intersect` here): nations having
    * both customers and suppliers. */
  private def setIntersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** Except: order priorities never used by URGENT-pile customers. */
  private def setExcept(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      .except(Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** SequenceFileInputFilter analog (`lib/input/SequenceFileInputFilter
    * .java`): RegexFilter (:110) + PercentFilter keep-every-Nth (:153)
    * composed as plain scan-time predicates — pushed to the parquet scan
    * by Catalyst, which the reference's record filters cannot do. */
  private def inputFilter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").rlike("(merge|sort)") && pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Logalyzer (`hadoop-tools/hadoop-extras/.../Logalyzer.java:69`):
    * grep-and-sort over "logs" — regex filter + multi-column
    * KeyFieldBasedComparator sort (`doAnalyze :215`).
    *
    * The narrow filtered relation is persisted (lazily) before the global
    * sort: a range exchange executes its child TWICE — once in the
    * RangePartitioner's sampling job, once for the shuffle itself — so an
    * uncached plan would re-scan the full log and re-run the regex +
    * `get_json_object` extraction per pass. At 100 TB that second pass is
    * the dominant cost; caching the survivors (a small fraction after the
    * grep) means the sampler reads cheap cached rows instead. Same policy
    * as [[graft.llm.TextDedup]]: the cache entry stays until the caller
    * clears it (Verify/Bench `clearCache()` between queries). */
  private def logalyzer(s: SparkSession, d: String): DataFrame = {
    val narrow = Tables.events(s, d)
      .filter(col("event_type").rlike("^(error|purchase)$") &&
        get_json_object(col("props"), "$.k").cast("long") >= 50)
      .select(col("event_id"), col("event_type"), col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    narrow.orderBy(col("event_type"), col("ts").desc, col("event_id"))
  }

  /** Salted two-phase aggregation (ops.Skew): exact algebraic merge, hot
    * keys spread over 8 partial buckets. Oracle = the plain GROUP BY. */
  private def skewSaltedAgg(s: SparkSession, d: String): DataFrame =
    graft.ops.Skew.saltedAgg(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_quantity").cast("long").as("qty")),
        Seq("l_returnflag"), buckets = 8,
        ("sum", "qty", "sum_qty"), ("count", "qty", "n"))
      .orderBy(col("l_returnflag"))

  /** Salted join (ops.Skew): fact row-salt + dimension replicated per
    * salt — same rows as the unsalted join, verified by the oracle. */
  private def skewSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity").cast("long").as("qty"))
    val dim = Tables.supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.ops.Skew.saltedJoin(fact, dim, "suppkey", buckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("s_nationkey"))
  }

  /** Typed Aggregator surface (ops.ValueAggregators.UniqValueCountAgg —
    * the reference's ValueAggregator partial/final contract as
    * Aggregator[IN,BUF,OUT]), oracle-checked through groupByKey.agg. */
  private def valueAggTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("event_type"), col("user_id").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.ops.ValueAggregators.UniqValueCountAgg(50).toColumn)
      .toDF("event_type", "uniq_uid_capped")
      .orderBy(col("event_type"))
  }

  /** Typed Dataset[T] pipeline (SURVEY.md §1.2 case-class surface):
    * compile-time-checked filter + groupByKey + typed Aggregator — the
    * reference's Writable-struct jobs with scalac instead of runtime
    * class config. Oracle-checked like every DataFrame query. */
  private def typedPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.scalalang.typed
    graft.core.Schemas.lineitem(s, d)
      .filter(l => l.l_quantity > 30.0 && l.l_returnflag != "N")
      .groupByKey(_.l_returnflag)
      .agg(
        typed.sumLong[graft.core.Schemas.Lineitem](_.l_quantity.toLong),
        typed.count[graft.core.Schemas.Lineitem](_ => 1))
      .toDF("l_returnflag", "sum_qty", "n")
      .orderBy(col("l_returnflag"))
  }

  /** Approximate-aggregate scale surface: HLL distinct + t-digest
    * quantiles — the 100 TB path for UniqValueCount / WordMedian when
    * exact answers stop being worth the shuffle. Sketch internals are
    * engine-specific, so this is rows-only; MiscSpec bounds the error
    * against the exact answers. */
  private def approxStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_median_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Exact heavy hitters over the document token stream via the native
    * Misra–Gries aggregate + candidate-verify second pass
    * ([[graft.ops.FrequentItems]]) — bounded sketch state instead of a
    * vocabulary-sized shuffle, yet the output is exact counts, so it
    * oracle-checks against a plain GROUP BY/HAVING. */
  private def heavyHitters(s: SparkSession, d: String): DataFrame =
    graft.ops.FrequentItems.exactHeavyHitters(
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok")),
      "tok", phi = 0.02)

  private val heavyHittersSql: String =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
      |tot AS (SELECT count(*) AS n FROM toks)
      |SELECT item, count(*) AS cnt FROM toks, tot
      |GROUP BY item, n HAVING count(*) > n * 0.02
      |ORDER BY cnt DESC, item""".stripMargin

  /** Rumen-style log analytics (`hadoop-tools/hadoop-rumen`): parse the
    * JSON props column with a declared schema (from_json — codegen'd,
    * no per-record driver work) and aggregate over extracted fields. */
  private def jsonParse(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val all: Seq[Q] = Seq(
    Q("json_parse", jsonParse,
      Some("""SELECT event_type, count(k) AS n_with_k,
             |  CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS k
             |      FROM events) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("approx_stats", approxStats, None), // sketches are engine-specific
    Q("heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    Q("typed_pipeline", typedPipeline,
      Some("""SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem WHERE l_quantity > 30.0 AND l_returnflag <> 'N'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    Q("skew_salted_agg", skewSaltedAgg,
      Some("""SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    Q("skew_salted_join", skewSaltedJoin,
      Some("""SELECT s_nationkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),
    Q("value_agg_typed", valueAggTyped,
      Some("""SELECT event_type, least(count(DISTINCT user_id), 50) AS uniq_uid_capped
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("set_intersect", setIntersect,
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),
    Q("set_except", setExcept,
      Some("""SELECT o_custkey AS custkey FROM orders
             |EXCEPT
             |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY custkey""".stripMargin)),
    Q("input_filter", inputFilter,
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE regexp_matches(text, '(merge|sort)') AND doc_id % 5 = 0
             |ORDER BY doc_id""".stripMargin)),
    Q("logalyzer", logalyzer,
      Some("""SELECT event_id, event_type, ts,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events
             |WHERE regexp_matches(event_type, '^(error|purchase)$')
             |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
             |ORDER BY event_type, ts DESC, event_id""".stripMargin)),
  )
}
