package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum md5 hex digest over
  * all `k`-character substrings of `text`, in one compiled loop.
  *
  * Semantically identical to
  * `array_min(transform(sequence(1, greatest(length(t)-k+1, 1)), i -> md5(substr(t, i, k))))`
  * and to the DuckDB mirror of that expression, but ~|text| interpreted
  * lambda invocations (each allocating a 32-char hex string) collapse
  * into one JVM method that compares raw 16-byte digests and hex-encodes
  * only the winner. Same preference-order rationale as
  * [[FloatDotProduct]]: higher-order-function lambdas never enter
  * whole-stage codegen, a custom expression does.
  */
case class MinGramDigest(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_mingram"

  // declared input types: (STRING, INT). ExpectsInputTypes is off-limits
  // (AbstractDataType is private[sql] in Spark 4), so the same contract
  // is enforced via checkInputDataTypes — a mistyped SQL call like
  // graft_mingram(8, text) or a BIGINT k fails analysis with a readable
  // message instead of a runtime ClassCastException. NULL-typed literals
  // are accepted: the null-safe eval short-circuits to NULL.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType | NullType, IntegerType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, INT) arguments, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(t: Any, kAny: Any): Any =
    MinGramDigest.compute(t.asInstanceOf[UTF8String], kAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.MinGramDigest.compute($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinGramDigest =
    copy(left = newLeft, right = newRight)
}

object MinGramDigest {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".toCharArray

  /** Min md5 over the k-grams; for texts shorter than k, the digest of
    * the whole text (mirrors `substr(t, 1, k)` clamping). Raw 16-byte
    * digests compare identically to their lowercase-hex encodings
    * (hex is byte-order-preserving), so only the winner is encoded.
    * Zero allocation per window: the text's bytes are copied out once,
    * windows are digested in place via (offset, len), and the two
    * 16-byte digest buffers are swapped rather than reallocated.
    * Positions are CHARACTER positions (as in substr): for non-ASCII
    * text a char→byte offset table is built in one pass. */
  def compute(text: UTF8String, k: Int): UTF8String = {
    val d = md.get()
    val bytes = text.getBytes
    val n = text.numChars()
    // char -> byte offset; identity when pure ASCII
    val off: Array[Int] =
      if (bytes.length == n) null
      else {
        val o = new Array[Int](n + 1)
        var b = 0
        var c = 0
        while (c < n) {
          o(c) = b
          b += UTF8String.numBytesForFirstByte(bytes(b))
          c += 1
        }
        o(n) = bytes.length
        o
      }
    @inline def at(c: Int): Int = if (off == null) c else off(c)
    val windows = math.max(n - k + 1, 1)
    var best = new Array[Byte](16)
    var cur = new Array[Byte](16)
    var i = 0
    while (i < windows) {
      val from = at(i)
      val until = at(math.min(i + k, n))
      d.reset()
      d.update(bytes, from, until - from)
      d.digest(cur, 0, 16)
      if (i == 0 || java.util.Arrays.compareUnsigned(cur, best) < 0) {
        val t = best; best = cur; cur = t
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = hex((best(j) >> 4) & 0xf).toByte
      out(2 * j + 1) = hex(best(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
