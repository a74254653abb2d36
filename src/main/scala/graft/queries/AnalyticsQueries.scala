package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Ops._

/** Word-statistics programs, multi-dimensional aggregates, event-time
  * windows, heterogeneous-input union, and the TeraSort analog.
  *
  * References: WordMean/WordMedian/WordStandardDeviation
  * (`EX/WordMean.java:54`, `EX/WordMedian.java:52`,
  * `EX/WordStandardDeviation.java:56`), MultipleInputs
  * (`lib/input/MultipleInputs.java:40`), TeraGen/TeraSort
  * (`EX/terasort/TeraGen.java`, `TeraSort.java`), rollup/cube (absent in
  * the reference — SURVEY.md §2.3 "missing vs SQL engines", exposed as
  * built-ins), event-time windows (beyond-reference §2.11, shared with the
  * streaming surface in [[graft.streaming.EventStreams]]).
  */
object AnalyticsQueries {

  private def tokens(s: SparkSession, d: String) =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")

  /** WordMean: total letters / total words via two global sums — the
    * reference emits special ("length", x)/("count", 1) keys; here it is
    * one partial-aggregated global agg, mean = single double division. */
  private def wordMean(s: SparkSession, d: String): DataFrame =
    tokens(s, d)
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("total_len"))
      .select(col("n_words"), col("total_len"),
        (col("total_len").cast("double") / col("n_words")).as("mean_len"))

  /** WordMedian: the reference histograms lengths then scans sorted output
    * in the driver (`EX/WordMedian.java:121`); `percentile` is the
    * declarative exact equivalent (distributed sort + interpolation). */
  private def wordMedian(s: SparkSession, d: String): DataFrame =
    tokens(s, d)
      .agg(percentile(length(col("word")), lit(0.5)).as("median_len"))

  /** WordStandardDeviation: sqrt(E[x^2] - E[x]^2) from exact integer sums
    * (`EX/WordStandardDeviation.java:56` uses the same two-moment trick);
    * expression order mirrored in the oracle for bit-exact doubles. */
  private def wordStddev(s: SparkSession, d: String): DataFrame = {
    val len = length(col("word")).cast("long")
    val mean = col("s").cast("double") / col("n")
    tokens(s, d)
      .agg(count(lit(1)).as("n"), sum(len).as("s"), sum(len * len).as("ss"))
      .select(col("n"), col("s"), col("ss"),
        sqrt(col("ss").cast("double") / col("n") - mean * mean).as("stddev_len"))
  }

  /** Exact order-price quantiles per status: the scale-correct exact
    * quantile (value-count aggregation first; the per-group window runs
    * over distinct values only — see [[graft.ops.Quantiles]]). */
  private def quantilesExact(s: SparkSession, d: String): DataFrame =
    graft.ops.Quantiles.exactQuantiles(
      Tables.orders(s, d), "o_orderstatus", cents(col("o_totalprice")),
      Seq(("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)))
      .select(col("g").as("status"), col("p"), col("v").as("q_cents"))

  /** One-pass KLL-sketch deciles over the same fixture: bounded state per
    * group regardless of value cardinality (see
    * [[graft.ops.Quantiles.approxQuantiles]]). Approximate by
    * construction → rows-only; KllSketchSpec pins the rank-error bound
    * and exact-below-capacity behavior. */
  private def quantilesSketch(s: SparkSession, d: String): DataFrame =
    graft.ops.Quantiles.approxQuantiles(
      Tables.orders(s, d), "o_orderstatus", cents(col("o_totalprice")),
      Seq(("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)),
      k = 512)
      .select(col("g").as("status"), col("p"), col("v").as("q_cents"))

  /** The FULL sketch-table lifecycle in one query: per-(status,
    * order-date) KLL summaries — the rows a warehouse PERSISTS — are
    * written once to a content-fingerprinted parquet artifact (crash-safe
    * completion marker, same lifecycle as the ANN/dedup indexes), and the
    * answer comes from the COLD-loaded table via `graft_kll_merge`: raw
    * orders are scanned only on the first-ever build, every subsequent
    * quantile query is metadata-sized work over sketch rows.
    *
    * FULL oracle since round 14 via the bound-certificate pattern
    * ([[quantilesSketchBound]]'s shape): the rolled-up estimates are
    * approximate by construction (merge order varies), so the query
    * emits the OBSERVED integer rank error of every estimate against the
    * exact data, asserted against the merged-sketch bound KllSketchSpec
    * pins (`2·levels·n/k`, one extra compaction generation per level) AS
    * DATA — the all-true oracle makes an accuracy regression in the
    * persisted-rollup path fail the driver's hash gate, not just a spec.
    * Atom-reinsertion roundtrip, parquet losslessness, and weight
    * conservation stay KllSketchSpec-pinned. */
  private def quantilesRollup(s: SparkSession, d: String): DataFrame = {
    val dir = graft.llm.IndexStore.indexDir(s, "kll_orders", s"$d/orders.parquet")
    graft.llm.IndexStore.ensure(s, dir) {
      graft.ops.Quantiles.sketchTable(
          Tables.orders(s, d), "o_orderstatus",
          "o_orderdate", cents(col("o_totalprice")), k = 512)
        .write.parquet(s"$dir/sketches")
    }
    val est = graft.ops.Quantiles.rollupQuantiles(
        s.read.parquet(s"$dir/sketches"), "g", "sketch", decileSpecs, k = 512)
      .select(col("g").as("status"), col("p"), col("v").as("est"))
    val o = Tables.orders(s, d).select(col("o_orderstatus").as("status"),
      cents(col("o_totalprice")).as("v"))
    val specs = { import s.implicits._; decileSpecs.toDF("p", "num", "den") }
    // merged-sketch rank bound: 2·levels·n/k, levels = ceil(log2(n/k))+1
    val levels = (ceil(log(2.0, col("n") / lit(512.0))) + 1L).cast("long")
    est.join(broadcast(specs), "p")
      .join(o, Seq("status"))
      .groupBy(col("status"), col("p"), col("est"), col("num"), col("den"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("below"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("at_or_below"))
      .select(col("status"), col("p"),
        (greatest(
          (col("below") + 1L) - ((col("num") * col("n") + col("den") - 1L) / col("den")),
          ((col("num") * col("n") + col("den") - 1L) / col("den")) - col("at_or_below"),
          lit(0L)) <= lit(2L) * levels * col("n") / lit(512L))
          .as("within_bound"))
      .orderBy(col("status"), col("p"))
  }

  private val decileSpecs =
    Seq(("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))

  /** KLL in the PROVABLY-exact sparse regime: per-status quantiles of the
    * orders-per-day distribution. The sketch's value stream is one row
    * per distinct order date — bounded by the fixture's fixed ~2.4k-day
    * date DOMAIN, not by row count, so it does not grow with SF — and
    * k = 8192 exceeds it, so no compactor ever fires anywhere (a level-0
    * buffer can only reach k if the total stream does): the summary IS
    * the exact weight-1 multiset under any partitioning and the quantiles
    * equal the exact pass bit-for-bit at ANY scale factor. This is the
    * driver-checkable certificate for the KLL kernel; [[quantilesSketch]]
    * stays rows-only as the genuinely-approximate dense mode. */
  private def quantilesSketchSparse(s: SparkSession, d: String): DataFrame = {
    val perDay = Tables.orders(s, d)
      .groupBy(col("o_orderstatus").as("status"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_orders"))
    graft.ops.Quantiles.approxQuantiles(
        perDay, "status", col("n_orders"), decileSpecs, k = 8192)
      .select(col("g").as("status"), col("p"), col("v").as("q_orders"))
  }

  /** The same sparse-exactness argument through the MERGE path: per-
    * (status, year) KLL summaries of the per-day order counts, rolled up
    * per status via `graft_kll_merge`. Every per-unit summary holds ≤366
    * weight-1 atoms and the merged level-0 total stays under k = 8192, so
    * atom re-insertion never compacts either — the rollup is exactly the
    * union multiset, certifying the finalized-output re-aggregation
    * kernel against the oracle (not just KllSketchSpec). */
  private def quantilesRollupSparse(s: SparkSession, d: String): DataFrame = {
    val perDay = Tables.orders(s, d)
      .groupBy(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("yr"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_orders"))
    val sketches = graft.ops.Quantiles.sketchTable(
      perDay, "status", "yr", col("n_orders"), k = 8192)
    graft.ops.Quantiles.rollupQuantiles(
        sketches, "g", "sketch", decileSpecs, k = 8192)
      .select(col("g").as("status"), col("p"), col("v").as("q_orders"))
  }

  /** HLL one-pass distinct counts in the exact-sparse regime: distinct
    * order DATES per status (~2.4k, fixed domain) sit under the p = 14
    * sparse bound (m/4 = 4096) at every SF, so the direct single-pass
    * sketch — no persisted table, unlike [[distinctRollup]] — answers
    * `count(DISTINCT o_orderdate)` exactly; [[distinctSketch]] stays
    * rows-only as the dense-register mode over prices. */
  private def distinctSketchSparse(s: SparkSession, d: String): DataFrame =
    graft.ops.DistinctCounts.sketchCounts(
        Tables.orders(s, d), "o_orderstatus", col("o_orderdate"), p = 14)
      .select(col("g").as("status"), col("n_distinct"))

  private def quantilesSparseSql(valueAlias: String): String =
    s"""WITH byd AS (SELECT o_orderstatus AS status, o_orderdate AS dt,
       |    count(*) AS c FROM orders GROUP BY 1, 2),
       |byv AS (SELECT status, c AS v, count(*) AS cnt FROM byd GROUP BY 1, 2),
       |cum AS (SELECT status, v, cnt,
       |        sum(cnt) OVER (PARTITION BY status ORDER BY v) AS hi,
       |        sum(cnt) OVER (PARTITION BY status) AS n FROM byv),
       |specs(p, num, den) AS (SELECT * FROM (VALUES
       |       ('p10',1,10),('p25',1,4),('p50',1,2),('p75',3,4),('p90',9,10)) t)
       |SELECT c.status, s.p, c.v AS $valueAlias
       |FROM cum c JOIN specs s
       |  ON ((s.num * c.n + s.den - 1) // s.den)
       |     BETWEEN c.hi - c.cnt + 1 AND c.hi""".stripMargin

  /** Dense-regime certificate for the KLL kernel: the rows-only
    * [[quantilesSketch]] config (k = 512, genuinely approximate) has its
    * accuracy pinned only in KllSketchSpec; this query computes the
    * OBSERVED rank error of every estimated decile against the exact
    * data — pure integer arithmetic: target rank ⌈num·n/den⌉, the
    * estimate's true rank interval [below+1, atOrBelow], error = distance
    * outside it — and asserts `err ≤ n div 50 + 1` (the spec's 2 % bound)
    * AS DATA. The oracle predicts all-true, so any accuracy regression in
    * the dense sketch now fails the driver's hash gate, not just a spec. */
  private def quantilesSketchBound(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select(col("o_orderstatus").as("status"),
      cents(col("o_totalprice")).as("v"))
    val est = graft.ops.Quantiles.approxQuantiles(
        Tables.orders(s, d), "o_orderstatus", cents(col("o_totalprice")),
        decileSpecs, k = 512)
      .select(col("g").as("status"), col("p"), col("v").as("est"))
    val specs = decileSpecs.toDF("p", "num", "den")
    est.join(broadcast(specs), "p")
      .join(o, Seq("status"))
      .groupBy(col("status"), col("p"), col("est"), col("num"), col("den"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("below"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("at_or_below"))
      .select(col("status"), col("p"),
        (greatest(
          (col("below") + 1L) - ((col("num") * col("n") + col("den") - 1L) / col("den")),
          ((col("num") * col("n") + col("den") - 1L) / col("den")) - col("at_or_below"),
          lit(0L)) <= col("n") / 50L + 1L).as("within_bound"))
      .orderBy(col("status"), col("p"))
  }

  /** Dense-regime certificate for the HLL kernel, same pattern: the
    * rows-only [[distinctSketch]] config (p = 12 over distinct prices,
    * dense registers) gets its observed error `|est − exact|` compared —
    * in integers — against the 5 % band DistinctSketchSpec asserts
    * (≈ 3σ at σ = 1.04/√4096). All-true oracle ⇒ driver-certified. */
  private def distinctSketchBound(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val est = graft.ops.DistinctCounts.sketchCounts(
        o, "o_orderstatus", cents(col("o_totalprice")), p = 12)
      .select(col("g").as("status"), col("n_distinct").as("est"))
    val exact = o.groupBy(col("o_orderstatus").as("status"))
      .agg(countDistinct(cents(col("o_totalprice"))).as("exact"))
    est.join(exact, "status")
      .select(col("status"),
        (abs(col("est") - col("exact")) * 20L <= col("exact")).as("within_5pct"))
      .orderBy(col("status"))
  }

  /** The distinct-count sketch table, full lifecycle (the COUNT DISTINCT
    * leg of the sketch warehouse next to [[quantilesRollup]]): one HLL
    * summary per (status, order-month) persisted once behind the
    * crash-safe build-once store, rolled up per status from the COLD
    * table. Per-status distinct order dates are ~2.4k at EVERY scale
    * factor — under the p=14 sparse bound (m/4 = 4096) — so the merged
    * summaries stay in exact-set mode and the answer equals
    * `count(DISTINCT o_orderdate)` bit-for-bit: oracle-checked, not
    * rows-only. DistinctSketchSpec pins the sparse/dense lifecycle, the
    * merge-order binary invariance, and the dense error bound. */
  private def distinctRollup(s: SparkSession, d: String): DataFrame = {
    val dir = graft.llm.IndexStore.indexDir(s, "hll_orders", s"$d/orders.parquet")
    graft.llm.IndexStore.ensure(s, dir) {
      graft.ops.DistinctCounts.sketchTable(
          Tables.orders(s, d)
            .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM")),
          "o_orderstatus", "month", col("o_orderdate"), p = 14)
        .write.parquet(s"$dir/sketches")
    }
    graft.ops.DistinctCounts.rollupCounts(
        s.read.parquet(s"$dir/sketches"), "g", "sketch", p = 14)
      .select(col("g").as("status"), col("n_distinct"))
  }

  /** Fixed-point integer PageRank over the customer→supplier trade graph
    * (distinct (o_custkey, l_suppkey) pairs; node ids disambiguated as
    * 2k / 2k+1), 3 iterations — an iterative relational fixpoint whose
    * exact long arithmetic lets it hash-match a DuckDB mirror that
    * unrolls the identical recurrence as chained CTEs (see
    * `ops/PageRank.scala`). */
  private def pagerank(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    graft.ops.PageRank.ranks(edges, "src", "dst", iterations = 3)
      .orderBy(col("pr").desc, col("node")).limit(100)
  }

  /** One unrolled oracle iteration: rank table `prev` → the next one,
    * mirroring PageRank.ranks' integer recurrence exactly (`//` in
    * DuckDB ≡ `div` in Spark on non-negative longs). */
  private def pagerankIterSql(prev: String): String =
    s"""SELECT n.node,
       |  CAST(150000 + (85 * COALESCE(s.cs, 0)) // 100 AS BIGINT) AS pr
       |FROM nodes n LEFT JOIN (
       |  SELECT e.dst AS node, CAST(SUM(r.pr // d.outdeg) AS BIGINT) AS cs
       |  FROM edges e JOIN $prev r ON e.src = r.node
       |    JOIN deg d ON e.src = d.src
       |  GROUP BY e.dst) s ON n.node = s.node""".stripMargin

  private def pagerankSql: String =
    s"""WITH edges AS (
       |  SELECT DISTINCT CAST(2*o_custkey AS BIGINT) AS src,
       |    CAST(2*l_suppkey+1 AS BIGINT) AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |r1 AS (${pagerankIterSql("r0")}),
       |r2 AS (${pagerankIterSql("r1")}),
       |r3 AS (${pagerankIterSql("r2")})
       |SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 100""".stripMargin

  /** Bounded k-core peeling on the part co-occurrence graph (same graph
    * as `triangle_count`): 3 rounds at k=16, each dropping every node
    * whose current degree is under k (`ops/GraphCores.scala`). Output is
    * the surviving nodes with their peeled-graph degrees — integral and
    * round-bounded, so the DuckDB mirror unrolls identically. */
  private def kcoreNodes(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = op.as("x").join(op.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    graft.ops.GraphCores.kCoreNodes(edges, "src", "dst", k = 16, rounds = 3)
      .orderBy(col("node"))
  }

  private def kcorePeelSql(prevE: String, dName: String, kName: String,
                           nextE: String, k: Int): String =
    s"""$dName AS (SELECT node, count(*) AS c FROM (
       |  SELECT a AS node FROM $prevE UNION ALL SELECT b FROM $prevE) t
       |  GROUP BY 1),
       |$kName AS (SELECT node FROM $dName WHERE c >= $k),
       |$nextE AS (SELECT a, b FROM $prevE
       |  WHERE a IN (SELECT node FROM $kName)
       |    AND b IN (SELECT node FROM $kName))""".stripMargin

  private def kcoreNodesSql: String =
    s"""WITH op AS (SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS p
       |  FROM lineitem WHERE l_partkey % 4 = 0),
       |e0 AS (SELECT x.p AS a, y.p AS b FROM op x JOIN op y
       |       ON x.l_orderkey = y.l_orderkey AND x.p < y.p GROUP BY 1, 2),
       |${kcorePeelSql("e0", "d1", "k1", "e1", 16)},
       |${kcorePeelSql("e1", "d2", "k2", "e2", 16)},
       |${kcorePeelSql("e2", "d3", "k3", "e3", 16)}
       |SELECT node, count(*) AS deg FROM (
       |  SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3) t
       |GROUP BY 1 ORDER BY node""".stripMargin

  /** Bounded connected components over the customer↔supplier trade
    * graph (same node encoding as `pagerank`): 6 rounds of min-label
    * propagation (`ops/Components.scala`), then component sizes. Labels
    * are node-id minima — integral — so the DuckDB mirror unrolls the
    * identical recurrence; ComponentsSpec pins bounded ≡ convergent
    * ([[graft.llm.DedupPipeline.components]]) on a fixture converging
    * within the bound. */
  private def connectedComponents(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    // per-NODE labels, not component sizes: every node's propagated
    // minimum is hash-checked, so a single wrong hop anywhere fails the
    // gate (the size rollup would mask label errors inside a component)
    graft.ops.Components.labelsBounded(edges, "src", "dst", rounds = 6)
      .orderBy(col("node"))
  }

  private def ccRoundSql(prev: String, next: String): String =
    s"""$next AS (SELECT node, min(rep) AS rep FROM (
       |  SELECT e.id2 AS node, r.rep FROM sym e JOIN $prev r ON e.id1 = r.node
       |  UNION ALL SELECT node, rep FROM $prev) t GROUP BY node)""".stripMargin

  private def connectedComponentsSql: String =
    s"""WITH edges AS (
       |  SELECT DISTINCT CAST(2*o_custkey AS BIGINT) AS src,
       |    CAST(2*l_suppkey+1 AS BIGINT) AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |sym AS (SELECT src AS id1, dst AS id2 FROM edges
       |        UNION SELECT dst, src FROM edges),
       |r0 AS (SELECT DISTINCT id1 AS node, id1 AS rep FROM sym),
       |${ccRoundSql("r0", "r1")},
       |${ccRoundSql("r1", "r2")},
       |${ccRoundSql("r2", "r3")},
       |${ccRoundSql("r3", "r4")},
       |${ccRoundSql("r4", "r5")},
       |${ccRoundSql("r5", "r6")}
       |SELECT node, rep FROM r6 ORDER BY node""".stripMargin

  /** Sketch set algebra: pairwise overlap of the per-status order-date
    * SETS computed from two fixed-size HLL summaries per pair
    * (`graft_hll_intersect`) — no raw-data join. Distinct dates sit
    * under the p=14 sparse bound at every test SF, so the intersection
    * is the exact set intersection and the query oracle-checks against
    * the real date-set join. */
  private def distinctOverlap(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sk = Tables.orders(s, d)
      .select(col("o_orderstatus").as("g"), xxhash64(col("o_orderdate")).as("v"))
      .groupBy("g")
      .agg(call_function("graft_hll", col("v"), lit(14)).as("sk"))
    sk.as("a").join(sk.as("b"), col("a.g") < col("b.g"))
      .select(col("a.g").as("s1"), col("b.g").as("s2"),
        call_function("graft_hll_intersect", col("a.sk"), col("b.sk")).as("n_common"))
      .filter(col("n_common") > 0)
      .orderBy(col("s1"), col("s2"))
  }

  /** Bounded BFS over the symmetrized customer↔supplier trade graph:
    * hop distances from the nation-0 customers, 3 rounds of min-plus
    * relaxation (`ops/GraphPaths.scala`). Integer distances, so the
    * fixpoint prefix hash-checks against the oracle's unrolled CTEs. */
  private def shortestHops(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("cn"),
        (col("l_suppkey") * 2 + 1).cast("long").as("sn"))
    // symmetrize by exploding both directions in ONE pass — a self-union
    // of the un-materialized base plan would run the orders⋈lineitem
    // join once per branch (guide §2.4)
    val edges = base.select(explode(array(
        struct(col("cn").as("src"), col("sn").as("dst")),
        struct(col("sn").as("src"), col("cn").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val sources = Tables.customer(s, d).filter(col("c_nationkey") === 0)
      .select((col("c_custkey") * 2).cast("long").as("n"))
    graft.ops.GraphPaths.shortestHops(edges, "src", "dst", sources, "n", 3)
      .orderBy(col("node"))
  }

  private def hopsIterSql(prev: String): String =
    s"""SELECT node, min(d) AS d FROM (
       |  SELECT node, d FROM $prev UNION ALL
       |  SELECT e.dst AS node, $prev.d + 1 AS d
       |  FROM $prev JOIN e ON $prev.node = e.src) t
       |GROUP BY node""".stripMargin

  private def shortestHopsSql: String =
    s"""WITH eb AS (SELECT DISTINCT CAST(2*o_custkey AS BIGINT) AS cn,
       |    CAST(2*l_suppkey+1 AS BIGINT) AS sn
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT cn AS src, sn AS dst FROM eb
       |      UNION ALL SELECT sn, cn FROM eb),
       |d0 AS (SELECT DISTINCT CAST(2*c_custkey AS BIGINT) AS node,
       |         CAST(0 AS BIGINT) AS d
       |       FROM customer WHERE c_nationkey = 0),
       |d1 AS (${hopsIterSql("d0")}),
       |d2 AS (${hopsIterSql("d1")}),
       |d3 AS (${hopsIterSql("d2")})
       |SELECT node, d FROM d3 ORDER BY node""".stripMargin

  /** Hourly resample + forward fill of each user's event-value series
    * (`ops/Resample.scala`): latest observation per (user, hour) bucket,
    * the full per-user hourly grid, gaps carry the last value forward.
    * Fill moves raw doubles untouched — bit-exact across engines, so the
    * whole grid hash-checks. (user_id, ts) is unique at every SF, making
    * the per-bucket argmax deterministic. */
  private def resampleGapfill(s: SparkSession, d: String): DataFrame =
    graft.ops.Resample.gapFill(Tables.events(s, d), "user_id", "ts",
        col("value"), stepSeconds = 3600L)
      .select(col("k").as("user_id"), col("bucket"), col("v"), col("n_obs"))
      .orderBy(col("user_id"), col("bucket"))

  /** Exact triangle count over the part co-occurrence graph (parts
    * appearing in the same order, module-sampled to keep the demo graph
    * sparse-ish): degree-oriented compact-forward wedges, closing edge
    * as a pure equi-join (`ops/Triangles.scala`). Plain relational
    * algebra end-to-end, so the DuckDB mirror of the same orientation
    * hash-matches exactly. */
  private def triangleCount(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = op.as("x").join(op.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    graft.ops.Triangles.count(edges, "src", "dst")
  }

  private def triangleCountSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS p
      |  FROM lineitem WHERE l_partkey % 4 = 0),
      |e AS (SELECT x.p AS a, y.p AS b FROM op x JOIN op y
      |      ON x.l_orderkey = y.l_orderkey AND x.p < y.p GROUP BY 1, 2),
      |deg AS (SELECT node, count(*) AS deg
      |        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) t
      |        GROUP BY 1),
      |o AS (SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
      |             CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v,
      |             CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dv
      |      FROM (SELECT e.a, e.b, x.deg AS da, y.deg AS db FROM e
      |            JOIN deg x ON e.a = x.node JOIN deg y ON e.b = y.node) t)
      |SELECT count(*) AS n_triangles
      |FROM o e1 JOIN o e2 ON e1.u = e2.u
      |  AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
      |JOIN o e3 ON e1.v = e3.u AND e2.v = e3.v""".stripMargin

  /** Count-Min frequency sketch warehouse roundtrip: per-returnflag
    * sketches of supplier traffic, counter-added into one global summary,
    * point-probed for the first 20 suppkeys. Distinct suppkeys stay under
    * the w/4 sparse bound at every test SF, so the probes are EXACT and
    * the whole path — build, merge, query — oracle-checks against
    * `count(*) GROUP BY l_suppkey` (see `FreqSketch.scala`). */
  private def freqSketch(s: SparkSession, d: String): DataFrame = {
    // w = 65536 keeps the merged summary in the exact-sparse regime
    // (distinct l_suppkey <= w/4 = 16384) through SF ~1.6 — the default
    // 16384 went dense at SF >= ~0.5, where point probes would overcount
    // and the oracle hash gate would fail with nothing naming the cause
    val w = 65536
    val perFlag = graft.ops.FreqCounts.sketchCounts(
      Tables.lineitem(s, d), "l_returnflag", col("l_suppkey"), d = 3, w = w)
    val global = graft.ops.FreqCounts.rollupSketches(
      perFlag, lit(1), col("sketch"), d = 3, w = w)
    val probes = s.range(0, 20).select(col("id").as("suppkey"))
    graft.ops.FreqCounts.pointQueries(global, col("sketch"), probes, col("suppkey"))
      .filter(col("freq") > 0) // absent probe keys (small SFs) drop out,
                               // mirroring the oracle's GROUP BY domain
      .select(col("key").as("suppkey"), col("freq"))
      .orderBy(col("suppkey"))
  }

  /** The same sketch on a cardinality that OUTGROWS the sparse bound
    * (distinct order prices, p=12 → dense registers above 1024 keys):
    * per-status distinct-price estimates at fixed 4 KiB state per group.
    * Approximate by construction in dense mode → rows-only;
    * DistinctSketchSpec pins the ±1.04/√m-scale error empirically and
    * the exact-below-bound regime this query sits in at sf0.001. */
  private def distinctSketch(s: SparkSession, d: String): DataFrame =
    graft.ops.DistinctCounts.sketchCounts(
        Tables.orders(s, d), "o_orderstatus", cents(col("o_totalprice")), p = 12)
      .select(col("g").as("status"), col("n_distinct"))
      .orderBy(col("status"))

  /** Rollup over (returnflag, linestatus): subtotals + grand total with
    * grouping_id — beyond-reference multi-dimensional agg (built-in). */
  private def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_price"))

  /** Cube over (orderstatus, orderpriority). */
  private def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("sum_price"))

  /** GROUPING SETS via the SQL surface. */
  private def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  sum(${sqlCents("l_extendedprice")}) / 100.0D AS sum_price
         |FROM graft_lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
  }

  /** Tumbling 1-hour event-time windows (beyond-reference streaming
    * surface run in batch mode — same plan shape as readStream). */
  private def windowTumbling(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.tumbling(Tables.events(s, d), "1 hour")

  /** Sliding 2-hour windows advancing by 1 hour. */
  private def windowSliding(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.sliding(Tables.events(s, d), "2 hours", "1 hour")

  /** Session windows: 30-minute inactivity gap per user. */
  private def windowSession(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.sessionized(Tables.events(s, d), "30 minutes")

  /** Stream-stream interval join run in batch (same code as the
    * streaming attribution join in [[graft.streaming.EventStreams
    * .intervalJoin]]; the watermark is a no-op in batch): view→click
    * pairs per user within 15 minutes. */
  private def intervalJoinAttrib(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.streaming.EventStreams.intervalJoin(views, clicks, "user_id",
        delay = "1 hour", within = "15 minutes")
      .select(col("l_event_id").as("view_id"), col("r_event_id").as("click_id"))
      .orderBy(col("view_id"), col("click_id"))
  }

  /** MultipleInputs: per-source schema adaptation + unionByName
    * (`lib/input/MultipleInputs.java:40`, `DelegatingMapper`). */
  private def multiInputsUnion(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey").as("id"),
      col("c_name").as("name"), lit("customer").as("src"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey").as("id"),
      col("s_name").as("name"), lit("supplier").as("src"))
    cust.unionByName(supp).orderBy(col("src"), col("id"))
  }

  /** TeraGen + TeraSort + rank: deterministic synthetic records (pure
    * function of the row index, like TeraGen's skip-ahead PRNG —
    * `EX/terasort/TeraGen.java`), total-order sort (sampler + range
    * exchange, `EX/Sort.java:57`), then a distributed rank via
    * zipWithIndex (two-pass offset scan — no single-reducer bottleneck;
    * the reference needs TotalOrderPartitioner + 1-file concat for this).
    */
  private val teraRows = 200000
  private def teraSort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sorted = s.range(teraRows)
      .select(md5(concat(lit("row-"), col("id").cast("string"))).as("k"),
        col("id"))
      .orderBy(col("k"))
    sorted.rdd.zipWithIndex
      .map { case (r, i) => (i, r.getString(0), r.getLong(1)) }
      .toDF("rank", "k", "id")
  }

  /** Pearson correlation from exact integer sums (the WordStandard-
    * Deviation two-moment trick extended to two variables): r =
    * (n·Σxy − Σx·Σy) / (sqrt(n·Σx²−(Σx)²)·sqrt(n·Σy²−(Σy)²)), every
    * aggregate an exact BIGINT, the combine a fixed-order double
    * expression mirrored in the oracle. The built-in `corr` would drift
    * (engine-specific accumulation order). */
  private def statsCorr(s: SparkSession, d: String): DataFrame = {
    // Small-magnitude variables (qty <= 50, discount-cents <= 10) keep
    // every moment sum exactly representable in double far past 10^12
    // rows — DuckDB's HUGEINT->DOUBLE cast is not correctly rounded, so
    // sums must never exceed 2^53 for a bit-exact cross-engine compare
    // (learned the hard way with price^2 sums at sf0.1).
    val x = col("l_quantity").cast("long")
    val y = round(col("l_discount") * 100).cast("long")
    def d_(c: Column): Column = c.cast("double")
    Tables.lineitem(s, d)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("n"),
        ((d_(col("n")) * d_(col("sxy")) - d_(col("sx")) * d_(col("sy"))) /
          (sqrt(d_(col("n")) * d_(col("sxx")) - d_(col("sx")) * d_(col("sx"))) *
           sqrt(d_(col("n")) * d_(col("syy")) - d_(col("sy")) * d_(col("sy")))))
          .as("corr_qty_disc"))
  }

  /** Value-bucket histogram (width_bucket analog via integer division —
    * the ValueHistogram idea over a continuous column). */
  private def valueBuckets(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(floor(cents(col("value")) / 2500).as("bucket"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy(col("bucket"))

  /** ntile + percent_rank window coverage: quartile assignment and
    * relative rank per customer's orders — (rank-1)/(n-1) is a single
    * int-derived division, bit-exact. */
  private def ntileRanks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prank"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact median at scale — the reference's actual WordMedian design
    * (`EX/WordMedian.java:121`: histogram of lengths + scan to the
    * middle): frequency histogram + running cumulative sum, then pick
    * the straddling value(s). Unlike `percentile`, per-group state is
    * one histogram bucket per DISTINCT value — exact and bounded even
    * when the corpus has 10^12 words. */
  private def wordMedianHist(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = tokens(s, d)
      .groupBy(length(col("word")).cast("long").as("len"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("freq")).over(w))
      .withColumn("total", sum(col("freq")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // straddle: first value with cum >= (total+1)/2 and, for even totals,
    // the first with cum >= total/2 + 1; median = (lo + hi) / 2
    val lo = cum.filter(col("cum") * 2 >= col("total"))
      .agg(min(col("len")).as("lo"))
    val hi = cum.filter(col("cum") * 2 >= col("total") + lit(2) -
        pmod(col("total"), lit(2)) * 2)
      .agg(min(col("len")).as("hi"))
    lo.crossJoin(hi).select(
      ((col("lo") + col("hi")).cast("double") / 2.0).as("median_len"))
  }

  /** Behavioral funnel over events: users progressing view → click →
    * purchase in time order (min event time per stage per user). */
  private def funnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val stages = e.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    stages.agg(
      count(col("t_view")).as("n_view"),
      count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
      count(when(col("t_click") > col("t_view") &&
        col("t_purchase") > col("t_click"), 1)).as("n_full_funnel"))
  }

  /** TF-IDF-style top terms: rank terms per document by tf * N / df —
    * the log-free rational variant so both engines compute the identical
    * double from exact integers (libm log is not cross-engine stable). */
  private def tfidfTop(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).count() // tiny scalar; fine on driver
    val scored = tf.join(df_, "term")
      .withColumn("score", (col("tf") * lit(n)).cast("double") / col("df"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))))
      .filter(col("rk") <= 3)
    scored.select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Pivot: returnflag x linestatus cross-tab (fixed pivot values keep
    * the schema deterministic — at scale never let pivot() infer values
    * with an extra distinct scan). */
  private def pivotAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .orderBy(col("l_returnflag"))

  /** Unpivot (melt): wide per-nation counts back to long form. */
  private def unpivotAgg(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(graft.queries.Ops.cents(col("c_acctbal"))).as("sum_bal_c"))
    wide.unpivot(Array(col("nationkey")),
        Array(col("n_cust"), col("sum_bal_c")), "metric", "value")
      .orderBy(col("nationkey"), col("metric"))
  }

  val all: Seq[Q] = Seq(
    Q("pivot_agg", pivotAgg,
      Some("""SELECT l_returnflag,
             |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F",
             |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O"
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    Q("unpivot_agg", unpivotAgg,
      Some("""WITH wide AS (
             |  SELECT c_nationkey AS nationkey, count(*) AS n_cust,
             |    CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_c
             |  FROM customer GROUP BY 1)
             |SELECT nationkey, 'n_cust' AS metric, n_cust AS value FROM wide
             |UNION ALL
             |SELECT nationkey, 'sum_bal_c' AS metric, sum_bal_c AS value FROM wide
             |ORDER BY nationkey, metric""".stripMargin)),
    Q("word_median_hist", wordMedianHist,
      Some("""SELECT median(length(w)) AS median_len
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
             |WHERE w <> ''""".stripMargin)),
    Q("funnel", funnel,
      Some("""SELECT count(t_view) AS n_view,
             |  count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
             |  count(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
             |    AS n_full_funnel
             |FROM (SELECT user_id,
             |        min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             |        min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             |        min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
             |      FROM events GROUP BY user_id) t""".stripMargin)),
    Q("tfidf_top", tfidfTop,
      Some("""WITH tf AS (
             |  SELECT doc_id, w AS term, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
             |  WHERE w <> '' GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents)
             |SELECT doc_id, term, tf, df, score, rk FROM (
             |  SELECT doc_id, term, tf, df,
             |    CAST(tf * n AS DOUBLE) / df AS score,
             |    CAST(row_number() OVER (PARTITION BY doc_id
             |      ORDER BY CAST(tf * n AS DOUBLE) / df DESC, term) AS INT) AS rk
             |  FROM tf JOIN df USING (term) CROSS JOIN n) x
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),
    Q("stats_corr", statsCorr,
      Some(s"""SELECT n,
              |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
              |    (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
              |     sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
              |  AS corr_qty_disc
              |FROM (SELECT count(*) AS n,
              |        sum(CAST(l_quantity AS BIGINT)) AS sx,
              |        sum(${sqlCents("l_discount")}) AS sy,
              |        sum(CAST(l_quantity AS BIGINT) * ${sqlCents("l_discount")}) AS sxy,
              |        sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
              |        sum(${sqlCents("l_discount")} * ${sqlCents("l_discount")}) AS syy
              |      FROM lineitem) t""".stripMargin)),
    Q("value_buckets", valueBuckets,
      Some(s"""SELECT CAST(floor(${sqlCents("value")} / 2500) AS BIGINT) AS bucket,
              |  count(*) AS n, sum(${sqlCents("value")}) / 100.0 AS sum_value
              |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin)),
    Q("ntile_ranks", ntileRanks,
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS INT)
             |    AS quartile,
             |  percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prank
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),
    Q("word_mean", wordMean,
      Some("""SELECT count(*) AS n_words,
             |  CAST(sum(length(w)) AS BIGINT) AS total_len,
             |  CAST(CAST(sum(length(w)) AS BIGINT) AS DOUBLE) / count(*) AS mean_len
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
             |WHERE w <> ''""".stripMargin)),
    Q("word_median", wordMedian,
      Some("""SELECT median(length(w)) AS median_len
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
             |WHERE w <> ''""".stripMargin)),
    Q("quantiles_exact", quantilesExact,
      // integer-rank discrete quantiles: ceil(p*n) via (num*n+den-1) div
      // den on both sides, so no FP enters the compare anywhere
      Some("""WITH byv AS (SELECT o_orderstatus AS status,
             |       CAST(round(o_totalprice*100) AS BIGINT) AS v,
             |       count(*) AS cnt FROM orders GROUP BY 1, 2),
             |cum AS (SELECT status, v, cnt,
             |       sum(cnt) OVER (PARTITION BY status ORDER BY v) AS hi,
             |       sum(cnt) OVER (PARTITION BY status) AS n FROM byv),
             |specs(p, num, den) AS (SELECT * FROM (VALUES
             |       ('p10',1,10),('p25',1,4),('p50',1,2),('p75',3,4),('p90',9,10)) t)
             |SELECT c.status, s.p, c.v AS q_cents
             |FROM cum c JOIN specs s
             |  ON ((s.num * c.n + s.den - 1) // s.den)
             |     BETWEEN c.hi - c.cnt + 1 AND c.hi""".stripMargin)),
    Q("quantiles_sketch", quantilesSketch,
      None), // sketch estimates depend on partition arrival order (within
             // the pinned error bound) — no stable oracle; KllSketchSpec
             // pins rank error vs the exact pass
    // FULL oracle since round 14: bound-certificate output (observed
    // integer rank error vs the merged-sketch bound, asserted as data —
    // see the def's scaladoc); the raw estimates stay spec-pinned
    Q("quantiles_rollup", quantilesRollup,
      Some("""SELECT status, p, true AS within_bound
             |FROM (SELECT DISTINCT o_orderstatus AS status FROM orders) s
             |CROSS JOIN (VALUES ('p10'),('p25'),('p50'),('p75'),('p90')) t(p)
             |ORDER BY status, p""".stripMargin)),
    // dense-regime error-bound certificates: observed error vs exact,
    // bound asserted as data under an all-true oracle (see scaladocs)
    Q("quantiles_sketch_bound", quantilesSketchBound,
      Some("""SELECT status, p, true AS within_bound
             |FROM (SELECT DISTINCT o_orderstatus AS status FROM orders) s
             |CROSS JOIN (VALUES ('p10'),('p25'),('p50'),('p75'),('p90')) t(p)
             |ORDER BY status, p""".stripMargin)),
    Q("distinct_sketch_bound", distinctSketchBound,
      Some("""SELECT o_orderstatus AS status, true AS within_5pct
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),
    // the sparse-regime certificates: same kernels, configs where the
    // sketch is provably exact at every SF (fixed date domain < k), so
    // the DRIVER certifies the KLL build and merge paths — see each
    // query's scaladoc for the no-compaction argument
    Q("quantiles_sketch_sparse", quantilesSketchSparse,
      Some(quantilesSparseSql("q_orders"))),
    Q("quantiles_rollup_sparse", quantilesRollupSparse,
      Some(quantilesSparseSql("q_orders"))),
    Q("distinct_sketch_sparse", distinctSketchSparse,
      Some("""SELECT o_orderstatus AS status,
             |  count(DISTINCT o_orderdate) AS n_distinct
             |FROM orders GROUP BY 1""".stripMargin)),
    Q("distinct_rollup", distinctRollup,
      // sparse-mode HLL is the exact distinct-key set (bijective
      // finalizer on long keys), so the sketch-table rollup is
      // oracle-checkable — see DistinctSketch.scala
      Some("""SELECT o_orderstatus AS status,
             |  count(DISTINCT o_orderdate) AS n_distinct
             |FROM orders GROUP BY 1""".stripMargin)),
    Q("distinct_sketch", distinctSketch,
      None), // dense-register estimate above the sparse bound is
             // approximate by construction (and its small-range
             // correction uses ln) — DistinctSketchSpec pins the error
             // bound and the exact sparse regime
    Q("pagerank", pagerank, Some(pagerankSql)),
    Q("triangle_count", triangleCount, Some(triangleCountSql)),
    Q("shortest_hops", shortestHops, Some(shortestHopsSql)),
    Q("kcore_nodes", kcoreNodes, Some(kcoreNodesSql)),
    Q("connected_components", connectedComponents, Some(connectedComponentsSql)),
    Q("distinct_overlap", distinctOverlap,
      Some("""WITH ds AS (SELECT DISTINCT o_orderstatus AS s, o_orderdate AS dt
             |            FROM orders)
             |SELECT a.s AS s1, b.s AS s2, count(*) AS n_common
             |FROM ds a JOIN ds b ON a.dt = b.dt AND a.s < b.s
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("resample_gapfill", resampleGapfill,
      Some("""WITH b AS (
             |  SELECT user_id, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket,
             |    max_by(value, ts) AS lastv, count(*) AS n_obs
             |  FROM events GROUP BY 1, 2),
             |span AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
             |         FROM b GROUP BY 1),
             |grid AS (SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS bucket
             |         FROM span),
             |j AS (SELECT g.user_id, g.bucket, b.lastv,
             |        COALESCE(b.n_obs, 0) AS n_obs
             |      FROM grid g LEFT JOIN b
             |        ON g.user_id = b.user_id AND g.bucket = b.bucket)
             |SELECT user_id, bucket,
             |  last_value(lastv IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY bucket) AS v,
             |  n_obs
             |FROM j ORDER BY user_id, bucket""".stripMargin)),
    Q("freq_sketch", freqSketch,
      // sparse-mode Count-Min is the exact (key → count) map, so the
      // build→merge→probe roundtrip is oracle-checkable — FreqSketchSpec
      // pins the dense regime's (ε, δ) overcount bound
      Some("""SELECT CAST(l_suppkey AS BIGINT) AS suppkey, count(*) AS freq
             |FROM lineitem WHERE l_suppkey < 20
             |GROUP BY 1 ORDER BY suppkey""".stripMargin)),
    Q("word_stddev", wordStddev,
      Some("""SELECT n, s, ss,
             |  sqrt(CAST(ss AS DOUBLE) / n
             |       - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS stddev_len
             |FROM (SELECT count(*) AS n,
             |        CAST(sum(length(w)) AS BIGINT) AS s,
             |        CAST(sum(length(w) * length(w)) AS BIGINT) AS ss
             |      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
             |      WHERE w <> '') agg""".stripMargin)),
    Q("rollup_agg", rollupAgg,
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              |  count(*) AS n,
              |  sum(${sqlCents("l_extendedprice")}) / 100.0 AS sum_price
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),
    Q("cube_agg", cubeAgg,
      Some(s"""SELECT o_orderstatus, o_orderpriority,
              |  CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
              |  count(*) AS n,
              |  sum(${sqlCents("o_totalprice")}) / 100.0 AS sum_price
              |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),
    Q("grouping_sets", groupingSets,
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
              |  sum(${sqlCents("l_extendedprice")}) / 100.0 AS sum_price
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)),
    Q("interval_join_attrib", intervalJoinAttrib,
      Some("""SELECT v.event_id AS view_id, c.event_id AS click_id
             |FROM events v JOIN events c
             |  ON v.user_id = c.user_id
             | AND v.event_type = 'view' AND c.event_type = 'click'
             | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 15 MINUTE
             |ORDER BY view_id, click_id""".stripMargin)),
    Q("window_tumbling", windowTumbling,
      Some(s"""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type,
              |  count(*) AS n, sum(${sqlCents("value")}) / 100.0 AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin)),
    Q("window_sliding", windowSliding,
      Some(s"""WITH assigned AS (
              |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, value FROM events
              |  UNION ALL
              |  SELECT time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR AS wstart,
              |    value FROM events)
              |SELECT wstart, count(*) AS n,
              |  sum(${sqlCents("value")}) / 100.0 AS sum_value
              |FROM assigned GROUP BY 1""".stripMargin)),
    Q("window_session", windowSession,
      Some("""WITH flagged AS (
             |  SELECT user_id, ts,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |              < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
             |  FROM events),
             |islands AS (
             |  SELECT user_id, ts,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flagged)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end,
             |  count(*) AS n_events
             |FROM islands GROUP BY user_id, sid""".stripMargin)),
    Q("multi_inputs_union", multiInputsUnion,
      Some("""SELECT id, name, src FROM (
             |  SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
             |  UNION ALL
             |  SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier)
             |ORDER BY src, id""".stripMargin)),
    Q("terasort", teraSort,
      Some(s"""SELECT row_number() OVER (ORDER BY md5('row-' || i)) - 1 AS rank,
              |  md5('row-' || i) AS k, i AS id
              |FROM range($teraRows) t(i)""".stripMargin)),
  )
}
