package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable distinct-count sketch as a native Catalyst aggregate
  * (`graft_hll(keyLong, p)`) — the third leg of the sketch-table
  * warehouse story next to [[KllSketch]] (quantiles) and
  * [[HeavyHitterSketch]] (frequent items): persist one tiny summary per
  * (group, unit), answer COUNT DISTINCT over any regrouping later from
  * the summaries alone, raw data never re-scanned.
  *
  * Structure per Flajolet et al. 2007 (HyperLogLog) with the
  * sparse-to-dense lifecycle of Heule et al. 2013 (HLL++, EDBT) — public
  * papers; the reference has no distinct-count surface beyond exact
  * `count distinct` group-bys (e.g. the aggregate wordcount family,
  * `EX/aggregatewordcount/…`):
  *
  *  - SPARSE below `m/4` distinct keys: the summary is the sorted set of
  *    finalized 64-bit keys, and the count is EXACT. The per-row
  *    finalizer is Murmur3's 64-bit fmix (public domain), a BIJECTION on
  *    longs — distinct inputs stay distinct with probability 1, not
  *    1 − 2⁻⁶⁴, so a sparse-mode answer is oracle-checkable against
  *    `count(DISTINCT …)` bit-for-bit. (String keys are pre-hashed to a
  *    long by the caller with codegen'd `xxhash64`; only there does the
  *    usual negligible-collision caveat apply.)
  *  - DENSE above the bound: `m = 2^p` byte registers, register j
  *    holding the max leading-zero rank of keys routed to it — O(2^p)
  *    bytes forever, any cardinality. The estimate is the standard
  *    harmonic mean with linear counting below 2.5·m (the only
  *    transcendental, `ln`, lives here — which is exactly why dense-mode
  *    queries are registered rows-only with a spec-pinned error bound).
  *
  * The canonical form (sorted sparse set / max-merged registers) is a
  * pure function of the input's distinct-key SET: sketch bytes are
  * IDENTICAL under any partitioning, merge order, or retry —
  * DistinctSketchSpec pins binary equality across repartitionings, a
  * stronger determinism than the KLL sketch (whose compaction history is
  * arrival-order dependent) can promise.
  *
  * Output: BINARY — the canonical serialized summary. Read the count out
  * with the scalar [[HllCount]] (`graft_hll_count`), re-aggregate saved
  * summaries with [[HllMergeSketch]] (`graft_hll_merge`).
  */
case class HllSketch(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctSketch.Summary] {

  private lazy val p: Int = pExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, pExpr.dataType) match {
      case (_: LongType | _: IntegerType | NullType, IntegerType) if pExpr.foldable =>
        pExpr.eval(InternalRow.empty) match {
          case i: java.lang.Integer if i >= 4 && i <= 16 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires p to be an INT literal in [4, 16]")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT/INT, foldable INT) arguments, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): DistinctSketch.Summary =
    new DistinctSketch.Summary(p)

  override def update(b: DistinctSketch.Summary, input: InternalRow): DistinctSketch.Summary = {
    val v = child.eval(input)
    if (v != null) b.add(DistinctSketch.fmix64(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }))
    b
  }

  override def merge(a: DistinctSketch.Summary, b: DistinctSketch.Summary): DistinctSketch.Summary = {
    a.mergeIn(b); a
  }

  override def eval(b: DistinctSketch.Summary): Any = b.toBytes

  override def serialize(b: DistinctSketch.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): DistinctSketch.Summary =
    DistinctSketch.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

/** Re-aggregate FINALIZED sketch outputs (`graft_hll_merge(sketch, p)`):
  * each input row is a canonical summary produced by [[HllSketch]];
  * summaries union losslessly (sparse = set union, dense = register
  * max), so rolling up a SAVED sketch table answers exactly what
  * re-sketching the raw union would — including staying exact while the
  * union remains under the sparse bound. */
case class HllMergeSketch(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctSketch.Summary] {

  private lazy val p: Int = pExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, pExpr.dataType) match {
      case (BinaryType | NullType, IntegerType) if pExpr.foldable =>
        pExpr.eval(InternalRow.empty) match {
          case i: java.lang.Integer if i >= 4 && i <= 16 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires p to be an INT literal in [4, 16]")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, foldable INT) arguments, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): DistinctSketch.Summary =
    new DistinctSketch.Summary(p)

  override def update(b: DistinctSketch.Summary, input: InternalRow): DistinctSketch.Summary = {
    val v = child.eval(input)
    if (v != null) b.mergeIn(DistinctSketch.Summary.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(a: DistinctSketch.Summary, b: DistinctSketch.Summary): DistinctSketch.Summary = {
    a.mergeIn(b); a
  }

  override def eval(b: DistinctSketch.Summary): Any = b.toBytes

  override def serialize(b: DistinctSketch.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): DistinctSketch.Summary =
    DistinctSketch.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

/** `graft_hll_intersect(a, b)`: the intersection cardinality of two
  * summaries — EXACT while both are sparse (the summaries are the
  * literal key sets, and the shared bijective finalizer means equal
  * keys stay equal), the clamped inclusion–exclusion estimate
  * `|A| + |B| − |A∪B|` once either side is dense (union = lossless
  * register merge). This is the set-algebra payoff of the sketch-table
  * design: overlap questions between any two saved groups answer from
  * two fixed-size summaries, no raw-data join — with the usual caveat
  * that inclusion–exclusion compounds the dense error, which is why the
  * registered overlap query runs in the oracle-exact sparse regime and
  * the dense bound lives in DistinctSketchSpec. */
case class HllIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_hll_intersect"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | NullType, BinaryType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, BINARY) arguments, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DistinctSketch.Summary.fromBytes(a.asInstanceOf[Array[Byte]])
      .intersectEstimate(
        DistinctSketch.Summary.fromBytes(b.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_hll_count(sketch)`: the distinct count out of a summary —
  * exact set size in sparse mode, the HLL estimate in dense. Scalar,
  * eval-only (CodegenFallback): it runs once per GROUP row after
  * aggregation, never per input row, so codegen buys nothing. */
case class HllCount(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hll_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DistinctSketch.Summary.fromBytes(input.asInstanceOf[Array[Byte]]).estimate()

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctSketch {

  /** Murmur3's 64-bit finalizer (public domain): a bijective avalanche —
    * used so long keys keep exact distinctness while gaining the bit
    * uniformity the dense registers need. */
  def fmix64(v: Long): Long = {
    var z = v
    z ^= z >>> 33
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33
    z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  /** Summary state: sparse = the exact set of finalized keys (bounded by
    * m/4 entries ≈ 2^(p+1) bytes serialized); dense = 2^p byte
    * registers. All operations preserve the invariant that the canonical
    * bytes depend only on the distinct-key SET (mode is a function of
    * set size alone: every subset of a ≤-bound set is ≤ bound, so no
    * merge order can dense-ify a small union or keep a large one
    * sparse). */
  final class Summary private (
      val p: Int,
      private var sparse: java.util.TreeSet[java.lang.Long],
      private var dense: Array[Byte]) {

    def this(p: Int) = this(p, new java.util.TreeSet[java.lang.Long](), null)

    private def m: Int = 1 << p
    private def sparseMax: Int = m / 4
    def isSparse: Boolean = dense == null

    /** `key` must already be finalized ([[fmix64]] / xxhash64). */
    def add(key: Long): Unit =
      if (dense != null) addDense(key)
      else {
        sparse.add(key)
        if (sparse.size > sparseMax) toDense()
      }

    private def addDense(key: Long): Unit = {
      val idx = (key >>> (64 - p)).toInt
      val rest = key << p
      // rank = leading zeros of the remaining 64-p bits, +1; rest == 0
      // gives nlz 64 -> capped at the max representable rank
      val rank = math.min(java.lang.Long.numberOfLeadingZeros(rest) + 1, 64 - p + 1)
      if (rank > dense(idx)) dense(idx) = rank.toByte
    }

    private def toDense(): Unit = {
      dense = new Array[Byte](m)
      val it = sparse.iterator()
      while (it.hasNext) addDense(it.next().longValue())
      sparse = null
    }

    def mergeIn(other: Summary): Unit = {
      require(other.p == p, s"cannot merge sketches with p=$p and p=${other.p}")
      if (other.dense != null) {
        if (dense == null) toDense()
        var j = 0
        while (j < m) {
          if (other.dense(j) > dense(j)) dense(j) = other.dense(j)
          j += 1
        }
      } else {
        val it = other.sparse.iterator()
        while (it.hasNext) add(it.next().longValue())
      }
    }

    /** Exact in sparse mode; Flajolet harmonic-mean estimate with the
      * small-range linear-counting correction in dense. */
    def estimate(): Long =
      if (dense == null) sparse.size.toLong
      else {
        var sum = 0.0
        var zeros = 0
        var j = 0
        while (j < m) {
          sum += java.lang.Math.scalb(1.0, -dense(j)) // 2^-reg, exact
          if (dense(j) == 0) zeros += 1
          j += 1
        }
        val alpha = m match {
          case 16 => 0.673
          case 32 => 0.697
          case 64 => 0.709
          case _ => 0.7213 / (1.0 + 1.079 / m)
        }
        val raw = alpha * m * m / sum
        val est =
          if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
          else raw
        math.round(est)
      }

    /** |this ∩ other|: exact set intersection while BOTH summaries are
      * sparse; clamped inclusion–exclusion over the lossless union
      * otherwise. */
    def intersectEstimate(other: Summary): Long = {
      require(other.p == p, s"cannot intersect sketches with p=$p and p=${other.p}")
      if (dense == null && other.dense == null) {
        var n = 0L
        val it = sparse.iterator()
        while (it.hasNext) if (other.sparse.contains(it.next())) n += 1
        n
      } else {
        val union = Summary.fromBytes(toBytes) // private-state-safe copy
        union.mergeIn(other)
        math.max(0L, estimate() + other.estimate() - union.estimate())
      }
    }

    /** Canonical bytes: [mode, p] then sorted keys (sparse) or the
      * registers (dense) — a pure function of the distinct-key set. */
    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      if (dense == null) {
        out.writeByte(0)
        out.writeByte(p)
        out.writeInt(sparse.size)
        val it = sparse.iterator()
        while (it.hasNext) out.writeLong(it.next().longValue())
      } else {
        out.writeByte(1)
        out.writeByte(p)
        out.write(dense)
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte]): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val mode = in.readByte()
      val p = in.readByte().toInt
      if (mode == 0) {
        val s = new Summary(p)
        val n = in.readInt()
        var i = 0
        while (i < n) { s.sparse.add(in.readLong()); i += 1 }
        s
      } else {
        val dense = new Array[Byte](1 << p)
        in.readFully(dense)
        new Summary(p, null, dense)
      }
    }
  }
}
