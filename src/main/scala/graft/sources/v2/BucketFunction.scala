package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-registered `bucket(n, key)` V2 function backing
  * storage-partitioned joins over [[graft.ops.BucketLayout]] tables.
  *
  * Spark resolves a scan-reported `KeyGroupedPartitioning(bucket(n1,
  * k1), bucket(n2, k2), …)` — one single-column transform per layout
  * key, the only shape Spark's SPJ machinery accepts — by loading
  * `bucket` from the table's catalog ([[SnapshotCatalog.loadFunction]])
  * and comparing the BOUND function's `canonicalName` + bucket count
  * per transform across the two join sides — equal means
  * co-partitioned, and `EnsureRequirements` plans the join with no
  * Exchange. The canonical name carries the key type, so an int-keyed
  * layout never claims compatibility with a long-keyed one (their hash
  * inputs differ).
  *
  * `produceResult` is the interpreted twin of the writer's per-column
  * `pmod(hash(key), n)` ([[graft.ops.BucketLayout.bucketId]]):
  * Murmur3 seed 42 over catalyst values — identical bytes, identical
  * result, with NULL hashing to the bare seed exactly as
  * `functions.hash` does. Spark evaluates it only on the
  * shuffle-one-side plan (`spark.sql.sources.v2.bucketing.shuffle
  * .enabled`) and the DSv2 INSERT write's required distribution; the
  * both-sides-bucketed join never calls it.
  *
  * MISMATCHED BUCKET COUNTS: the bound function is a
  * [[ReducibleFunction]] — two layouts over the same key type whose
  * counts share a divisor reduce to `gcd(n1, n2)` buckets via
  * `id % gcd` (sound because `floorMod(h, n) ≡ h (mod g)` whenever
  * `g | n`), so with `spark.sql.sources.v2.bucketing
  * .allowCompatibleTransforms.enabled` an n=8 table joins an n=16 table
  * with ZERO Exchange: Spark coalesces the 16 buckets pairwise onto the
  * 8. Coprime counts return no reducer and plan the honest shuffle.
  */
object BucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): pmod(murmur3_hash(key), n) — the graft bucket-layout function"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.length != 2)
      throw new UnsupportedOperationException(
        s"bucket takes (numBuckets INT, key), got $inputType")
    inputType.fields(0).dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType => ()
      case other => throw new UnsupportedOperationException(
        s"bucket count must be integral, got $other")
    }
    inputType.fields(1).dataType match {
      case dt: LongType => new BoundLong(dt)
      case dt @ (_: IntegerType | _: DateType) => new BoundInt(dt)
      case dt: ShortType => new BoundShort(dt)
      case dt: ByteType => new BoundByte(dt)
      case dt: StringType => new BoundString(dt)
      case dt: BooleanType => new BoundBoolean(dt)
      case other => throw new UnsupportedOperationException(
        s"bucket does not support key type ${other.catalogString}")
    }
  }

  /** Typed subclasses exist for the MAGIC METHOD (`invoke`): Spark
    * resolves a ScalarFunction's `invoke(int, <key>)` by reflection at
    * PLAN time and emits a codegen'd direct call — without it, every
    * row of the routed-INSERT shuffle and the shuffle-one-side SPJ pays
    * an interpreted `produceResult` with a fresh InternalRow (measured
    * 1.5x on the SQL-vs-API ingest probe). Each `invoke` clones the
    * per-type arm of catalyst's `InterpretedHashFunction.hash` exactly
    * (hashInt / hashLong / hashUnsafeBytes, seed 42), and the
    * interpreted `produceResult` stays as the contract twin the specs
    * compare against the writer. NULLs never reach `invoke` (Spark
    * null-checks the arguments); the writer's null contract
    * (bare-seed bucket) is task-placement-only on the write path, and
    * a join key's null rows can never match, so the two null behaviors
    * are observationally equal everywhere the function runs. */
  private[v2] sealed abstract class Bound(keyDt: DataType)
    extends ScalarFunction[Integer] with ReducibleFunction[Integer, Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyDt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${keyDt.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      // functions.hash of NULL is the bare seed (42); match it exactly
      val h =
        if (input.isNullAt(1)) 42
        else Murmur3HashFunction.hash(input.get(1, keyDt), keyDt, 42L).toInt
      java.lang.Math.floorMod(h, n)
    }

    /** gcd-coalescing reducer: both sides of an n1-vs-n2 SPJ reduce
      * their bucket ids mod gcd(n1, n2); null when THIS side is already
      * at the gcd (no reduction needed) or the functions/key types
      * differ (no compatibility claim — Spark plans the shuffle). */
    override def reducer(thisNumBuckets: Int,
                         other: ReducibleFunction[_, _],
                         otherNumBuckets: Int): Reducer[Integer, Integer] =
      other match {
        case b: Bound if b.canonicalName() == canonicalName() =>
          val g = java.math.BigInteger.valueOf(thisNumBuckets.toLong)
            .gcd(java.math.BigInteger.valueOf(otherNumBuckets.toLong)).intValue()
          if (g <= 1 || g == thisNumBuckets) null
          else new BucketReducer(g)
        case _ => null
      }
  }

  // serializable: Spark ships the reducer to executors inside
  // StoragePartitionJoinParams when the grouped read coalesces buckets
  private final class BucketReducer(g: Int)
    extends Reducer[Integer, Integer] with Serializable {
    override def reduce(id: Integer): Integer =
      java.lang.Math.floorMod(id.intValue(), g)
  }

  import org.apache.spark.unsafe.hash.Murmur3_x86_32

  private[v2] final class BoundLong(dt: DataType) extends Bound(dt) {
    def invoke(n: Int, key: Long): Int =
      java.lang.Math.floorMod(Murmur3_x86_32.hashLong(key, 42), n)
  }
  private[v2] final class BoundInt(dt: DataType) extends Bound(dt) {
    def invoke(n: Int, key: Int): Int =
      java.lang.Math.floorMod(Murmur3_x86_32.hashInt(key, 42), n)
  }
  private[v2] final class BoundShort(dt: DataType) extends Bound(dt) {
    def invoke(n: Int, key: Short): Int =
      java.lang.Math.floorMod(Murmur3_x86_32.hashInt(key.toInt, 42), n)
  }
  private[v2] final class BoundByte(dt: DataType) extends Bound(dt) {
    def invoke(n: Int, key: Byte): Int =
      java.lang.Math.floorMod(Murmur3_x86_32.hashInt(key.toInt, 42), n)
  }
  private[v2] final class BoundBoolean(dt: DataType) extends Bound(dt) {
    def invoke(n: Int, key: Boolean): Int =
      java.lang.Math.floorMod(
        Murmur3_x86_32.hashInt(if (key) 1 else 0, 42), n)
  }
  private[v2] final class BoundString(dt: DataType) extends Bound(dt) {
    def invoke(n: Int, key: org.apache.spark.unsafe.types.UTF8String): Int =
      java.lang.Math.floorMod(Murmur3_x86_32.hashUnsafeBytes(
        key.getBaseObject, key.getBaseOffset, key.numBytes, 42), n)
  }
}
