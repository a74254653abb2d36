package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass mergeable quantile summary as a native Catalyst aggregate
  * (`graft_kll(value, k)`) — the approximate complement of the exact
  * [[graft.ops.Quantiles]] pass, in the same sketch-plus-exact-verify
  * pairing as [[HeavyHitterSketch]] / `FrequentItems`.
  *
  * Why a sketch when an exact pass exists: the exact construction's
  * shuffle is bounded by DISTINCT-value cardinality, which is small for
  * cents/lengths but unbounded for raw measurements (timestamps, scores,
  * byte sizes) at 100 TB. This aggregate's state is O(k·log(n/k)) values
  * per partial buffer REGARDLESS of cardinality, and two summaries merge
  * losslessly-in-structure (concatenate levels, re-compact) — the
  * map-side partial / reduce-side final split is sound by construction.
  *
  * Structure (compactor hierarchy per Karnin–Lang–Liberty, FOCS 2016,
  * with equal-capacity levels as in Manku–Rajagopalan–Lindsay, SIGMOD
  * 1998/99 — public papers; the reference has no quantile surface beyond
  * the driver-side median scan, `EX/WordMedian.java:121`): level h holds
  * items of weight 2^h. A full level is sorted and every second element
  * (alternating offset per level, DETERMINISTIC — Spark re-executes
  * partial aggregates on retry, so a random coin would make retried
  * stages disagree with their first run) is promoted with doubled weight.
  * Each compaction of level h perturbs any rank by at most 2^h, and
  * level h compacts ~n/(k·2^h) times, so the total rank error is
  * O(n·levels/k) worst-case — KllSpec pins the bound empirically, and
  * the odd leftover element simply stays in its level (no weight is ever
  * created or destroyed: the summary's total weight equals n exactly,
  * also pinned).
  *
  * Output: `array<struct<v bigint, w bigint>>` sorted by value — the
  * weighted multiset CDF. Rank selection over it reuses the same
  * integer-arithmetic machinery as the exact path
  * ([[graft.ops.Quantiles.approxQuantiles]]).
  */
case class KllSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.Summary] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll"
  override def dataType: DataType = KllSketch.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (_: LongType | _: IntegerType | NullType, IntegerType) if kExpr.foldable =>
        kExpr.eval(InternalRow.empty) match {
          case i: java.lang.Integer if i >= 8 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires k to be an INT literal >= 8")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT/INT, foldable INT) arguments, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): KllSketch.Summary = new KllSketch.Summary(k)

  override def update(b: KllSketch.Summary, input: InternalRow): KllSketch.Summary = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    })
    b
  }

  override def merge(a: KllSketch.Summary, b: KllSketch.Summary): KllSketch.Summary = {
    a.mergeIn(b); a
  }

  override def eval(b: KllSketch.Summary): Any = b.result()

  override def serialize(b: KllSketch.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch.Summary =
    KllSketch.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Re-aggregate FINALIZED sketch outputs (`graft_kll_merge(sketch, k)`):
  * each input row is a weighted-CDF array produced by [[KllSketch]], and
  * every (v, w = 2^h) atom is re-inserted at level h
  * ([[KllSketch.Summary.addWeighted]]) — reconstructing the summary
  * structure the atoms came from, then merging across rows with the same
  * compactor rules.
  *
  * This is the missing half of the 100 TB sketch story: a SKETCH TABLE.
  * Persist per-unit sketches (per day, per source, per file) once, then
  * answer quantile queries over any subset or regrouping by aggregating
  * the tiny sketch rows — the raw data is never re-scanned. Soundness is
  * the same mergeability argument as the partial/final split inside one
  * aggregation; the rank-error bound degrades only by the extra
  * compaction rounds the merge itself triggers (pinned in KllSketchSpec
  * against the exact pass).
  */
case class KllMergeSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.Summary] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge"
  override def dataType: DataType = KllSketch.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (ArrayType(st: StructType, _), IntegerType)
          if st.fields.length == 2 &&
            st.fields.forall(_.dataType == LongType) && kExpr.foldable =>
        kExpr.eval(InternalRow.empty) match {
          case i: java.lang.Integer if i >= 8 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires k to be an INT literal >= 8")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRUCT<BIGINT,BIGINT>>, foldable INT) " +
          s"arguments, got (${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): KllSketch.Summary = new KllSketch.Summary(k)

  override def update(b: KllSketch.Summary, input: InternalRow): KllSketch.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val atom = arr.getStruct(i, 2)
        b.addWeighted(atom.getLong(0), atom.getLong(1))
        i += 1
      }
    }
    b
  }

  override def merge(a: KllSketch.Summary, b: KllSketch.Summary): KllSketch.Summary = {
    a.mergeIn(b); a
  }

  override def eval(b: KllSketch.Summary): Any = b.result()

  override def serialize(b: KllSketch.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch.Summary =
    KllSketch.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KllSketch {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("w", LongType, nullable = false))), containsNull = false)

  /** Compactor hierarchy: `levels(h)` holds unsorted values of weight 2^h,
    * each level bounded by k (level 0 may briefly reach k before its
    * cascade). `parity(h)` alternates the kept offset between compactions
    * of the same level so successive rank perturbations cancel rather
    * than accumulate in one direction. */
  final class Summary private[KllSketch] (
      val k: Int,
      private val levels: ArrayBuffer[ArrayBuffer[Long]],
      private val parity: ArrayBuffer[Boolean],
      private var count: Long) {

    def this(k: Int) = this(k, ArrayBuffer(ArrayBuffer.empty[Long]), ArrayBuffer(false), 0L)

    def n: Long = count
    def depth: Int = levels.length

    def add(v: Long): Unit = {
      levels(0) += v
      count += 1
      if (levels(0).length >= k) compact(0)
    }

    /** Re-insert a weighted atom (v, w = 2^h) at its level — the inverse
      * of [[result]]'s flatten, so feeding one summary's output atoms
      * back in reconstructs an equivalent summary (same per-level
      * multisets; parity restarts, which only steers FUTURE compaction
      * choices). This is what makes finalized sketch OUTPUTS re-
      * aggregable: a saved sketch table can be rolled up later without
      * the raw data. */
    def addWeighted(v: Long, w: Long): Unit = {
      require(w > 0 && (w & (w - 1)) == 0,
        s"sketch atom weight must be a power of two, got $w")
      val h = java.lang.Long.numberOfTrailingZeros(w)
      while (levels.length <= h) {
        levels += ArrayBuffer.empty[Long]
        parity += false
      }
      levels(h) += v
      count += w
      if (levels(h).length >= k) compact(h)
    }

    def mergeIn(other: Summary): Unit = {
      require(other.k == k, s"cannot merge summaries with k=$k and k=${other.k}")
      while (levels.length < other.levels.length) {
        levels += ArrayBuffer.empty[Long]
        parity += false
      }
      var h = 0
      while (h < other.levels.length) {
        levels(h) ++= other.levels(h)
        h += 1
      }
      count += other.count
      h = 0
      while (h < levels.length) {
        if (levels(h).length >= k) compact(h)
        h += 1
      }
    }

    /** Sort level h, promote every second element of the even-sized
      * prefix with doubled weight, keep the odd leftover (the maximum)
      * in place. Total weight is invariant: 2·w·(pairs) promoted as
      * 2w·(pairs), leftover keeps w. */
    private def compact(h: Int): Unit = {
      if (levels.length == h + 1) {
        levels += ArrayBuffer.empty[Long]
        parity += false
      }
      val buf = levels(h)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val pairs = arr.length / 2
      val offset = if (parity(h)) 1 else 0
      parity(h) = !parity(h)
      buf.clear()
      if (arr.length % 2 == 1) buf += arr(arr.length - 1) // odd leftover stays
      val next = levels(h + 1)
      var i = 0
      while (i < pairs) {
        next += arr(2 * i + offset)
        i += 1
      }
      if (next.length >= k) compact(h + 1)
    }

    /** Catalyst-internal result: array<struct<v,w>> sorted by value. */
    def result(): GenericArrayData = {
      val out = ArrayBuffer.empty[(Long, Long)]
      var h = 0
      while (h < levels.length) {
        val w = 1L << h
        levels(h).foreach(v => out += ((v, w)))
        h += 1
      }
      val rows = out.sortBy(_._1)
        .map { case (v, w) => new GenericInternalRow(Array[Any](v, w)): InternalRow }
      new GenericArrayData(rows.toArray.asInstanceOf[Array[Any]])
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeLong(count)
      out.writeInt(levels.length)
      var h = 0
      while (h < levels.length) {
        out.writeBoolean(parity(h))
        out.writeInt(levels(h).length)
        levels(h).foreach(out.writeLong)
        h += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte]): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val k = in.readInt()
      val count = in.readLong()
      val nLevels = in.readInt()
      val levels = ArrayBuffer.empty[ArrayBuffer[Long]]
      val parity = ArrayBuffer.empty[Boolean]
      var h = 0
      while (h < nLevels) {
        parity += in.readBoolean()
        val sz = in.readInt()
        val buf = new ArrayBuffer[Long](sz)
        var i = 0
        while (i < sz) { buf += in.readLong(); i += 1 }
        levels += buf
        h += 1
      }
      new Summary(k, levels, parity, count)
    }
  }
}
