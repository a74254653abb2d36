package graft.queries

import graft.SparkTestBase

/** Plan-shape regression tests: lock in the physical-plan properties the
  * 100 TB design depends on — pushdown reaching the parquet scan, pruned
  * read schemas, broadcast dimension joins, top-k without a global sort.
  * A refactor that silently loses one of these still passes value
  * checks; this suite fails it. */
class PlanShapeSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.executedPlan.toString + "\n" +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
  }

  test("scan_project_filter: predicate pushed to parquet, schema pruned") {
    val p = plan("scan_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    // projection pruning: only the 4 referenced columns are read
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_shipdate:timestamp_ntz>"), p)
  }

  test("join_inner: dimension sides broadcast, top-k via TakeOrderedAndProject") {
    val p = plan("join_inner")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1_agg: partial aggregation before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("partial_count"), p)
  }

  test("input_filter: scan-time record filters reach the parquet reader") {
    val p = plan("input_filter")
    assert(p.contains("PushedFilters") && p.contains("doc_id"), p)
  }

  test("partitionBy output prunes partitions on read-back filters") {
    val path = java.nio.file.Files.createTempDirectory("prune").resolve("docs").toString
    graft.ops.Outputs.writeMultipleOutputs(
      graft.core.Tables.documents(spark, sf0001), path, byCol = "lang")
    val filtered = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("lang") === "fr")
    val explained = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the lang=fr predicate must become a partition filter, not a scan filter
    assert(explained.contains("PartitionFilters") &&
      explained.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"), explained)
    val total = graft.core.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("lang") === "fr").count()
    assert(filtered.count() == total)
  }

  test("dedup_embedding_cosine: block equi-join, no nested-loop or cartesian") {
    val p = plan("dedup_embedding_cosine")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("wordcount: explode stays inside one stage with partial count") {
    val p = plan("wordcount")
    assert(p.contains("Generate explode"), p)
    assert(p.contains("partial_count") || p.contains("partial count"), p)
  }

  test("sample_hash: the selection predicate sits on the scan, no shuffle") {
    val p = plan("sample_hash")
    assert(!p.contains("Exchange"), p) // pure scan -> filter -> project
    assert(p.contains("*(1) Filter"), p) // filter inside whole-stage codegen
  }

  test("sample_stratified: per-stratum thresholds ride in as a broadcast") {
    val p = plan("sample_stratified")
    assert(p.contains("BroadcastHashJoin"), p)
    // exactly one exchange: the broadcast of the tiny rates table; the
    // corpus itself is never re-partitioned
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("bm25_top: corpus scalars and per-term dfs broadcast back, postings never rehashed") {
    val p = plan("bm25_top")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("line_dedup first-occurrence agg partial-aggregates map-side") {
    val p = plan("line_dedup")
    assert(p.contains("partial_min") || p.contains("partial min"), p)
  }

  test("dedup_edit_distance: segment-probe candidates via hash join; nested loops only for scalars and the short residue") {
    val p = plan("dedup_edit_distance")
    // the candidate join on (l, i, seg) must stay an equi-join — a
    // regression to theta/cartesian would be all-pairs in disguise
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // nested loops are only legitimate against constant-sized sides:
    // the 1-row corpus-LCP scalar (a conditionless Cross) and the
    // length-banded short-string residue (strings under t+1 chars;
    // `abs(...) <= t` band). Audit on executedPlan.toString, where the
    // join conditions print inline
    val phys = graft.SparkEntry.queries("dedup_edit_distance")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val bnlj = phys.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.nonEmpty, phys) // the residue + scalar joins exist
    bnlj.foreach { line =>
      assert(line.contains("Cross") || line.contains("abs("), line)
    }
  }

  test("logalyzer: k extraction cached below the range exchange, narrow shuffle") {
    val df = graft.SparkEntry.queries("logalyzer")(spark, sf0001)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the get_json_object extraction must be computed BELOW the sort's
    // range exchange: the shuffle then moves narrow (event_id, type, ts,
    // k) rows — never the wide props JSON — and nothing above the
    // exchange re-parses JSON. The exchange must read the persisted
    // narrow relation (InMemoryTableScan): a range exchange executes its
    // child twice (RangePartitioner sampling pass + shuffle pass), so an
    // uncached child would re-scan the full log and re-run the regex +
    // JSON extraction a second time — THE dominant cost at 100 TB.
    val ex = "\\(\\d+\\) Exchange".r.findFirstMatchIn(formatted)
    assert(ex.isDefined, formatted)
    val aboveExchange = formatted.substring(ex.get.start)
    assert(!aboveExchange.contains("get_json_object"), formatted)
    assert(formatted.contains("InMemoryTableScan"), formatted)
    assert(aboveExchange.linesIterator.take(3).mkString("\n").contains("k#"),
      formatted)
  }

  test("knn queries: per-query ranking is a bounded aggregation, not a corpus window sort") {
    // row_number().over(partitionBy(qid)) funnels each query's ENTIRE
    // scored candidate set (the whole corpus for brute force / plain PQ,
    // nprobe/nlist of it for IVF) through one task's sort. The TopK
    // aggregator ranks with O(k) state and map-side partial merge — the
    // shuffle carries at most k rows per query per task. knn_bruteforce
    // and knn_ann_lsh have NO window at all; the PQ paths keep exactly
    // one, over the already-bounded k*rerank exact-rerank shortlist.
    for (q <- Seq("knn_bruteforce", "knn_ann_lsh")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
        s"$q: $p")
      assert(!p.contains("Window"), s"$q must not window-sort the corpus: $p")
    }
    for (q <- Seq("knn_ann_ivf", "knn_ann_pq", "knn_ann_ivfpq")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
        s"$q: $p")
    }
  }

  test("collocations: no full-vocabulary relation is broadcast-hinted") {
    val df = graft.SparkEntry.queries("collocations")(spark, sf0001)
    val analyzed = df.queryExecution.analyzed.toString
    // exactly ONE broadcast hint survives: the 1-row bigram-total scalar
    // (bounded by construction). The unigram vocabulary joins must carry
    // no hint — at 100 TB the vocabulary is 10^7-10^8 rows and a forced
    // broadcast is a driver collect that can blow the broadcast limit;
    // unhinted they shuffle on the word key (AQE may still broadcast
    // small actuals at runtime, which is the correct place to decide).
    val hints = "ResolvedHint".r.findAllIn(analyzed).size
    assert(hints == 1, s"expected 1 broadcast hint (the scalar total), got $hints:\n$analyzed")
  }

  test("tpch_q6_forecast: pure scan-aggregate — predicates on the scan, no join") {
    val p = plan("tpch_q6_forecast")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("tpch_q19_disjunctive: one broadcast equi-join, residual OR post-join, no cartesian") {
    val p = plan("tpch_q19_disjunctive")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("tpch_q4_priority: EXISTS decorrelates to a semi join; date filters pushed") {
    val p = plan("tpch_q4_priority")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), p)
  }

  test("tpch_q13_custdist: zero-order customers survive via a left outer join") {
    val p = plan("tpch_q13_custdist")
    assert(p.contains("LeftOuter"), p)
    assert(p.contains("partial_count"), p)
  }

  test("tpch_q21_waiting: double correlation stays equi-joined; top-k without global sort") {
    val p = plan("tpch_q21_waiting")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pipeline_e2e: sample filter applies before the packing shuffle") {
    val df = graft.SparkEntry.queries("pipeline_e2e")(spark, sf0001)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the md5-threshold sample must appear as a Filter below the
    // MapGroups/packing, not above it — sampling after packing would
    // shuffle rows that are then thrown away
    val filterIdx = optimized.indexOf("md5")
    val packIdx = optimized.indexOf("MapGroups")
    assert(filterIdx >= 0 && packIdx >= 0 && packIdx < filterIdx, optimized)
  }
}
