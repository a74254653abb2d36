package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable point-frequency sketch as a native Catalyst aggregate
  * (`graft_cms(keyLong, d, w)`) — the fourth leg of the sketch-table
  * warehouse story next to [[KllSketch]] (quantiles), [[HllSketch]]
  * (distinct counts) and [[HeavyHitterSketch]] (top items): persist one
  * tiny summary per (group, unit), answer "how often did key k occur?"
  * over any regrouping later from the summaries alone.
  *
  * Structure per Cormode & Muthukrishnan 2005 (Count-Min; J. Algorithms)
  * with the same sparse-to-dense lifecycle as [[DistinctSketch]]:
  *
  *  - SPARSE below `w/4` distinct keys: the summary is the exact sorted
  *    (key → count) map, and every point query is EXACT — which is what
  *    makes a sparse-mode query oracle-checkable against `count(*) GROUP
  *    BY key` bit-for-bit.
  *  - DENSE above the bound: `d` rows of `w` counters; key k increments
  *    counter `g_i(k) mod w` in each row i, and the point estimate is the
  *    row-minimum. Guarantees: estimate ≥ true count always (counters
  *    only over-count via collisions), and ≤ true + e/w·N with
  *    probability 1 − e^−d. The `d` row hashes come from the
  *    Kirsch–Mitzenmacher 2006 double-hashing construction
  *    `g_i = h1 + i·h2` over two Murmur3-finalized halves — no stored
  *    seed table, so two independently-built sketches always agree.
  *
  * Counters are SUMS and the sparse map is sorted, so the canonical bytes
  * depend only on the input MULTISET — identical under any partitioning,
  * merge order, or retry (FreqSketchSpec pins binary equality across
  * repartitionings). Mode is a function of the distinct-key set alone
  * (subsets of a ≤-bound set stay bounded), so no merge order can flip it.
  *
  * The reference's closest surface is the aggregate wordcount family
  * (`EX/aggregatewordcount/…` — exact, full-vocabulary shuffle); Spark
  * ships `count_min_sketch` but its binary has no SQL-level merge
  * aggregate and no exact regime, which is what the warehouse story and
  * the oracle gate need.
  *
  * Output: BINARY — the canonical serialized summary. Point-query with
  * the scalar [[CmsQuery]] (`graft_cms_query`), re-aggregate saved
  * summaries with [[CmsMergeSketch]] (`graft_cms_merge`).
  */
case class CmsSketch(
    child: Expression,
    dExpr: Expression,
    wExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Summary] {

  private lazy val d: Int = dExpr.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val w: Int = wExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, dExpr, wExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    FreqSketch.checkArgs(prettyName, child.dataType, dExpr, wExpr,
      keyTypeOk = t => t.isInstanceOf[LongType] || t.isInstanceOf[IntegerType] ||
        t.isInstanceOf[NullType])

  override def createAggregationBuffer(): FreqSketch.Summary =
    new FreqSketch.Summary(d, w)

  override def update(b: FreqSketch.Summary, input: InternalRow): FreqSketch.Summary = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }, 1L)
    b
  }

  override def merge(a: FreqSketch.Summary, b: FreqSketch.Summary): FreqSketch.Summary = {
    a.mergeIn(b); a
  }

  override def eval(b: FreqSketch.Summary): Any = b.toBytes

  override def serialize(b: FreqSketch.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): FreqSketch.Summary =
    FreqSketch.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dExpr = newChildren(1), wExpr = newChildren(2))
}

/** Re-aggregate FINALIZED sketch outputs (`graft_cms_merge(sketch, d, w)`):
  * sparse maps union by summing counts, dense counter arrays add
  * element-wise — both lossless w.r.t. the sketch semantics, so rolling
  * up a SAVED sketch table answers exactly what re-sketching the raw
  * union would, including staying exact while the union stays sparse. */
case class CmsMergeSketch(
    child: Expression,
    dExpr: Expression,
    wExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Summary] {

  private lazy val d: Int = dExpr.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val w: Int = wExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, dExpr, wExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_merge"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    FreqSketch.checkArgs(prettyName, child.dataType, dExpr, wExpr,
      keyTypeOk = t => t.isInstanceOf[BinaryType] || t.isInstanceOf[NullType])

  override def createAggregationBuffer(): FreqSketch.Summary =
    new FreqSketch.Summary(d, w)

  override def update(b: FreqSketch.Summary, input: InternalRow): FreqSketch.Summary = {
    val v = child.eval(input)
    if (v != null) b.mergeIn(FreqSketch.Summary.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(a: FreqSketch.Summary, b: FreqSketch.Summary): FreqSketch.Summary = {
    a.mergeIn(b); a
  }

  override def eval(b: FreqSketch.Summary): Any = b.toBytes

  override def serialize(b: FreqSketch.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): FreqSketch.Summary =
    FreqSketch.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dExpr = newChildren(1), wExpr = newChildren(2))
}

/** `graft_cms_query(sketch, key)`: the frequency of `key` out of a
  * summary — exact count (0 for absent keys) in sparse mode, the
  * row-minimum upper estimate in dense. Scalar, eval-only
  * (CodegenFallback): it runs once per probe row after aggregation, never
  * per input row, so codegen buys nothing. */
case class CmsQuery(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_cms_query"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | NullType, _: LongType | _: IntegerType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, BIGINT/INT) arguments, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    FreqSketch.Summary.fromBytes(sketch.asInstanceOf[Array[Byte]]).estimate(key match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FreqSketch {

  private[functions] def checkArgs(
      name: String, keyType: DataType, dExpr: Expression, wExpr: Expression,
      keyTypeOk: DataType => Boolean): TypeCheckResult =
    (dExpr.dataType, wExpr.dataType) match {
      case (IntegerType, IntegerType)
          if keyTypeOk(keyType) && dExpr.foldable && wExpr.foldable =>
        (dExpr.eval(InternalRow.empty), wExpr.eval(InternalRow.empty)) match {
          case (d: java.lang.Integer, w: java.lang.Integer)
              if d >= 1 && d <= 10 && w >= 16 && w <= (1 << 22) =>
            TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$name requires INT literals d in [1, 10] and w in [16, 2^22]")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$name requires (key, foldable INT d, foldable INT w) arguments")
    }

  /** Summary state: sparse = exact sorted (key → count) map (bounded by
    * w/4 entries); dense = d·w long counters plus the total mass n (kept
    * for the ε·N error-bound statement). All operations preserve the
    * invariant that the canonical bytes depend only on the input
    * multiset. */
  final class Summary private (
      val d: Int,
      val w: Int,
      private var n: Long,
      private var sparse: java.util.TreeMap[java.lang.Long, java.lang.Long],
      private var dense: Array[Long]) {

    def this(d: Int, w: Int) =
      this(d, w, 0L, new java.util.TreeMap[java.lang.Long, java.lang.Long](), null)

    private def sparseMax: Int = w / 4
    def isSparse: Boolean = dense == null
    def total: Long = n

    def add(key: Long, count: Long): Unit = {
      n += count
      if (dense != null) addDense(key, count)
      else {
        val prev = sparse.get(key)
        sparse.put(key, if (prev == null) count else prev + count)
        if (sparse.size > sparseMax) toDense()
      }
    }

    /** Kirsch–Mitzenmacher double hashing: row i probes
      * `(h1 + i·h2) mod w` with h1/h2 independent finalizations of the
      * key — deterministic across builds, no seed table to ship. */
    private def rowIndex(key: Long, i: Int): Int = {
      val h1 = DistinctSketch.fmix64(key)
      val h2 = DistinctSketch.fmix64(key ^ 0x9e3779b97f4a7c15L) | 1L
      java.lang.Math.floorMod(h1 + i * h2, w.toLong).toInt
    }

    private def addDense(key: Long, count: Long): Unit = {
      var i = 0
      while (i < d) {
        dense(i * w + rowIndex(key, i)) += count
        i += 1
      }
    }

    private def toDense(): Unit = {
      dense = new Array[Long](d * w)
      val it = sparse.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        addDense(e.getKey.longValue(), e.getValue.longValue())
      }
      sparse = null
    }

    def mergeIn(other: Summary): Unit = {
      require(other.d == d && other.w == w,
        s"cannot merge sketches with (d,w)=($d,$w) and (${other.d},${other.w})")
      n += other.n
      if (other.dense != null) {
        if (dense == null) toDense()
        var j = 0
        while (j < d * w) {
          dense(j) += other.dense(j)
          j += 1
        }
      } else {
        val it = other.sparse.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          n -= e.getValue.longValue() // add() re-counts it
          add(e.getKey.longValue(), e.getValue.longValue())
        }
      }
    }

    /** Exact in sparse mode (0 for absent keys); the CM row-minimum
      * upper-bound estimate in dense. */
    def estimate(key: Long): Long =
      if (dense == null) {
        val v = sparse.get(key)
        if (v == null) 0L else v.longValue()
      } else {
        var min = Long.MaxValue
        var i = 0
        while (i < d) {
          val c = dense(i * w + rowIndex(key, i))
          if (c < min) min = c
          i += 1
        }
        min
      }

    /** Canonical bytes: [mode, d, w, n] then sorted (key, count) pairs
      * (sparse) or the counters (dense) — a pure function of the input
      * multiset. */
    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeByte(if (dense == null) 0 else 1)
      out.writeByte(d)
      out.writeInt(w)
      out.writeLong(n)
      if (dense == null) {
        out.writeInt(sparse.size)
        val it = sparse.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          out.writeLong(e.getKey.longValue())
          out.writeLong(e.getValue.longValue())
        }
      } else {
        var j = 0
        while (j < d * w) { out.writeLong(dense(j)); j += 1 }
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte]): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val mode = in.readByte()
      val d = in.readByte().toInt
      val w = in.readInt()
      val n = in.readLong()
      if (mode == 0) {
        val s = new Summary(d, w)
        val cnt = in.readInt()
        var i = 0
        while (i < cnt) {
          s.sparse.put(in.readLong(), in.readLong())
          i += 1
        }
        s.n = n
        s
      } else {
        val dense = new Array[Long](d * w)
        var j = 0
        while (j < d * w) { dense(j) = in.readLong(); j += 1 }
        new Summary(d, w, n, null, dense)
      }
    }
  }
}
