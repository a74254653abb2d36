package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Codegen'd dot product of two `array<float>` columns in double
  * precision, accumulating left-to-right — numerically identical to the
  * `aggregate(sequence(1,n), 0.0D, (acc,i) -> acc + x[i]*y[i])` fold (and
  * to DuckDB's `list_reduce` oracle mirror), but compiled into the
  * whole-stage-codegen loop instead of interpreted per-element lambda
  * evaluation. On the all-pairs cosine stage at sf0.1 this is the
  * difference between ~30s and ~2s; at 100 TB it keeps the similarity
  * kernels on the Tungsten fast path.
  *
  * Preference order per the build charter: compose built-ins if possible →
  * custom Catalyst `Expression` with `doGenCode` (this) → Scala UDF. The
  * built-in higher-order functions never enter codegen, which is why the
  * custom expression wins here.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // declared input types: both ARRAY<FLOAT>. ExpectsInputTypes is
  // off-limits (AbstractDataType is private[sql] in Spark 4), so the
  // contract is enforced via checkInputDataTypes — a call over
  // array<double> embeddings fails analysis with a readable message
  // instead of garbage from getFloat on a double-backed ArrayData.
  // NULL-typed literals (graft_dot(NULL, vec)) are accepted: the
  // null-safe eval short-circuits to NULL, matching built-in behavior.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | NullType, ArrayType(FloatType, _) | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<FLOAT>) arguments, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of the engine's native expressions, so they
  * are usable from `expr("graft_dot(a, b)")` / SQL. Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => FloatDotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mingram", exprs => MinGramDigest(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      exprs => HeavyHitterSketch(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kll",
      exprs => KllSketch(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kll_merge",
      exprs => KllMergeSketch(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll",
      exprs => HllSketch(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_merge",
      exprs => HllMergeSketch(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_count",
      exprs => HllCount(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_intersect",
      exprs => HllIntersect(exprs.head, exprs(1)), "built-in")
    // Spark's own runtime-filter expressions (SPARK-32268), exposed by
    // name so BloomJoin can drive them through the public Column API:
    // graft_bloom_agg(xxhash64(k), ndv, numBits) -> BINARY filter;
    // graft_bloom_contains(filterBytes, xxhash64(k)) -> BOOLEAN (codegen'd)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => CmsSketch(exprs.head, exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_merge",
      exprs => CmsMergeSketch(exprs.head, exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_query",
      exprs => CmsQuery(exprs.head, exprs(1)), "built-in")
  }
}
