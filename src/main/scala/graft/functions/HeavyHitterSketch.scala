package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a native Catalyst aggregate
  * (`graft_heavy_hitters(item, k)`) — the "novel sketch" extension path:
  * a [[TypedImperativeAggregate]] whose per-group state is a bounded
  * counter map, executed by ObjectHashAggregateExec with map-side
  * partial aggregation, exactly like Spark's own percentile_approx.
  *
  * Why a sketch and not `groupBy(item).count`: at 100 TB the item column
  * (words, URLs, user ids) has a vocabulary far larger than any single
  * executor, and a full groupBy shuffles the ENTIRE vocabulary to find
  * the handful of frequent items. This aggregate carries at most 2k
  * counters per partial buffer — the shuffle moves O(2k · partitions)
  * rows regardless of vocabulary size — and still comes with the classic
  * deterministic guarantee (Misra & Gries 1982; merge rule and bound
  * from Agarwal et al., "Mergeable Summaries", PODS 2012 — public
  * papers; no reference-code counterpart, the reference's only frequency
  * tool is a full WordCount, `EX/WordCount.java:36`):
  *
  *   - every stored estimate undercounts: est ≤ true ≤ est + err,
  *   - err (tracked exactly, per summary) ≤ n / (k+1) where n is the
  *     total weight the summary absorbed,
  *   - hence every item with true count > n/(k+1) is IN the summary.
  *
  * The purge rule keeps the bound through merges: when a buffer exceeds
  * 2k entries, subtract the (k+1)-th largest count v from every entry
  * and drop the non-positive ones. At least k+1 entries held ≥ v, so
  * each purge destroys ≥ (k+1)·v mass; summing over purges gives
  * Σv = err ≤ n/(k+1). Merging two summaries sums counters pairwise
  * (and their errs), then purges once — the bound is closed under merge,
  * which is what makes the map-side partial/final split sound.
  *
  * Output: `array<struct<item string, est bigint, err bigint>>` sorted
  * by est desc, item asc; `true ∈ [est, est + err]` for every row. The
  * exact-answer wrapper (candidates → second exact pass) lives in
  * [[graft.ops.FrequentItems]].
  */
case class HeavyHitterSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitterSketch.Summary] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"
  override def dataType: DataType = HeavyHitterSketch.resultType

  // same contract style as FloatDotProduct/MinGramDigest: declared types
  // enforced at analysis (ExpectsInputTypes is private[sql] in Spark 4).
  // k must be a foldable positive INT so every buffer is born with the
  // same capacity on every executor.
  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (_: StringType | NullType, IntegerType) if kExpr.foldable =>
        kExpr.eval(InternalRow.empty) match {
          case i: java.lang.Integer if i > 0 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires k to be a positive INT literal")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, foldable INT) arguments, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): HeavyHitterSketch.Summary =
    new HeavyHitterSketch.Summary(k)

  override def update(b: HeavyHitterSketch.Summary, input: InternalRow): HeavyHitterSketch.Summary = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(a: HeavyHitterSketch.Summary, b: HeavyHitterSketch.Summary): HeavyHitterSketch.Summary = {
    a.mergeIn(b); a
  }

  override def eval(b: HeavyHitterSketch.Summary): Any = b.result()

  override def serialize(b: HeavyHitterSketch.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): HeavyHitterSketch.Summary =
    HeavyHitterSketch.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object HeavyHitterSketch {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** Bounded counter map: at most 2k entries held, purged down to ≤ k.
    * `err` is the exact cumulative purge mass — the maximum possible
    * undercount of any stored (or evicted) item. Keys are defensive
    * clones: the UTF8String handed to `add` may point into a row buffer
    * the scan reuses for the next row. */
  final class Summary private[HeavyHitterSketch] (
      val k: Int,
      private val counts: mutable.HashMap[UTF8String, Long],
      private var errAcc: Long) {

    def this(k: Int) = this(k, mutable.HashMap.empty, 0L)

    def err: Long = errAcc
    def size: Int = counts.size

    def add(item: UTF8String, w: Long = 1L): Unit = {
      counts.get(item) match {
        case Some(c) =>
          // Scala's mutable.HashMap keeps the existing (cloned) key when
          // updating a present entry, so the transient `item` never leaks in
          counts.update(item, c + w)
        case None =>
          counts.update(item.clone(), w)
          if (counts.size > 2 * k) purge()
      }
    }

    def mergeIn(other: Summary): Unit = {
      other.counts.foreach { case (item, c) =>
        // other's keys are already private clones — safe to share
        counts.updateWith(item) {
          case Some(mine) => Some(mine + c)
          case None       => Some(c)
        }
      }
      errAcc += other.errAcc
      if (counts.size > 2 * k) purge()
    }

    /** Subtract the (k+1)-th largest count from every entry, drop the
      * non-positive: ≤ k survivors, ≥ (k+1)·v mass destroyed, so the
      * global bound Σv ≤ n/(k+1) holds (see class doc). */
    private def purge(): Unit = {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val v = vals(vals.length - (k + 1)) // (k+1)-th largest
      counts.filterInPlace((_, c) => c > v)
      counts.mapValuesInPlace((_, c) => c - v)
      errAcc += v
    }

    /** Catalyst-internal result: array<struct<item,est,err>> sorted by
      * est desc, item asc (byte order — consistent across JVMs). */
    def result(): GenericArrayData = {
      val rows = counts.toArray
        .sortWith { case ((i1, c1), (i2, c2)) =>
          if (c1 != c2) c1 > c2 else i1.compareTo(i2) < 0
        }
        .map { case (item, c) =>
          new GenericInternalRow(Array[Any](item, c, errAcc)) : InternalRow
        }
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeLong(errAcc)
      out.writeInt(counts.size)
      counts.foreach { case (item, c) =>
        val b = item.getBytes
        out.writeInt(b.length)
        out.write(b)
        out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte]): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val k = in.readInt()
      val err = in.readLong()
      val n = in.readInt()
      val m = mutable.HashMap.empty[UTF8String, Long]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        m.update(UTF8String.fromBytes(b), in.readLong())
        i += 1
      }
      new Summary(k, m, err)
    }
  }
}
