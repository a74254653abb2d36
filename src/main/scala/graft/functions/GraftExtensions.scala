package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — the idiomatic way to ship the
  * engine's native expressions into any session:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * [[GraftFunctions.register]] remains for sessions created without
  * extensions (same registry, idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // persisted views over the snapshot catalog: CREATE/DROP VIEW on a
    // SnapshotCatalog identifier become catalog commands; stored
    // definitions substitute at read (graft.sources.v2.SnapshotViews)
    ext.injectParser((session, delegate) =>
      new graft.sources.v2.SnapshotViewParser(session, delegate))
    ext.injectResolutionRule(session =>
      graft.sources.v2.SnapshotViewSubstitution(session))
    // transparent MV routing: a fresh materialized view serves the
    // aggregates it stores (graft.sources.v2.MvRewrite — freshness
    // proven against the plan's pinned base version, never guessed)
    ext.injectOptimizerRule(session =>
      graft.sources.v2.MvRewrite(session))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatDotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_mingram"),
      new ExpressionInfo(classOf[MinGramDigest].getName, "graft_mingram"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinGramDigest(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitterSketch].getName, "graft_heavy_hitters"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HeavyHitterSketch(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_kll"),
      new ExpressionInfo(classOf[KllSketch].getName, "graft_kll"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllSketch(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeSketch].getName, "graft_kll_merge"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllMergeSketch(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllSketch(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_merge"),
      new ExpressionInfo(classOf[HllMergeSketch].getName, "graft_hll_merge"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllMergeSketch(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_count"),
      new ExpressionInfo(classOf[HllCount].getName, "graft_hll_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllCount(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_intersect"),
      new ExpressionInfo(classOf[HllIntersect].getName, "graft_hll_intersect"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllIntersect(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsSketch].getName, "graft_cms"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CmsSketch(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_merge"),
      new ExpressionInfo(classOf[CmsMergeSketch].getName, "graft_cms_merge"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CmsMergeSketch(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_query"),
      new ExpressionInfo(classOf[CmsQuery].getName, "graft_cms_query"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CmsQuery(exprs.head, exprs(1))))
  }
}
