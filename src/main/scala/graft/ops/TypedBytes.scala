package graft.ops

import java.io.{DataInput, DataOutput, EOFException}
import java.nio.charset.StandardCharsets

/** Hadoop Streaming typed-bytes wire format (reference:
  * `hadoop-tools/hadoop-streaming/.../typedbytes/Type.java:27-37` for the
  * type codes, `TypedBytesInput.java` / `TypedBytesOutput.java` for the
  * framing): each value is a 1-byte type code followed by a
  * type-dependent big-endian payload. This is the binary `-io typedbytes`
  * mode of the streaming ecosystem — subprocesses exchange structured
  * values (including nested vectors/lists/maps) instead of tab-split
  * text lines.
  *
  * Scala mapping: BYTES↔Array[Byte], BYTE↔Byte, BOOL↔Boolean, INT↔Int,
  * LONG↔Long, FLOAT↔Float, DOUBLE↔Double, STRING↔String,
  * VECTOR↔IndexedSeq, LIST↔List (unbounded, MARKER-terminated on the
  * wire), MAP↔Map. All eleven tags roundtrip, arbitrarily nested
  * (TypedBytesSpec).
  */
object TypedBytes {

  // type codes (typedbytes/Type.java:27-37)
  final val BYTES = 0
  final val BYTE = 1
  final val BOOL = 2
  final val INT = 3
  final val LONG = 4
  final val FLOAT = 5
  final val DOUBLE = 6
  final val STRING = 7
  final val VECTOR = 8
  final val LIST = 9
  final val MAP = 10
  final val MARKER = 255

  def write(out: DataOutput, v: Any): Unit = v match {
    case b: Array[Byte] =>
      out.writeByte(BYTES); out.writeInt(b.length); out.write(b)
    case b: Byte => out.writeByte(BYTE); out.writeByte(b.toInt)
    case b: Boolean => out.writeByte(BOOL); out.writeBoolean(b)
    case i: Int => out.writeByte(INT); out.writeInt(i)
    case l: Long => out.writeByte(LONG); out.writeLong(l)
    case f: Float => out.writeByte(FLOAT); out.writeFloat(f)
    case d: Double => out.writeByte(DOUBLE); out.writeDouble(d)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeByte(STRING); out.writeInt(b.length); out.write(b)
    case l: List[_] => // unbounded list: elements then MARKER
      out.writeByte(LIST); l.foreach(write(out, _)); out.writeByte(MARKER)
    case v: scala.collection.Seq[_] => // counted vector
      out.writeByte(VECTOR); out.writeInt(v.size); v.foreach(write(out, _))
    case m: scala.collection.Map[_, _] =>
      out.writeByte(MAP); out.writeInt(m.size)
      m.foreach { case (k, value) => write(out, k); write(out, value) }
    case other =>
      throw new IllegalArgumentException(
        s"no typed-bytes encoding for ${other.getClass}")
  }

  /** One value, or None at clean EOF (stream exhausted between values). */
  def readOpt(in: DataInput): Option[Any] = {
    val code = try in.readUnsignedByte()
    catch { case _: EOFException => return None }
    Some(readBody(in, code))
  }

  private def readBody(in: DataInput, code: Int): Any = code match {
    case BYTES =>
      val b = new Array[Byte](in.readInt()); in.readFully(b); b
    case BYTE => in.readByte()
    case BOOL => in.readBoolean()
    case INT => in.readInt()
    case LONG => in.readLong()
    case FLOAT => in.readFloat()
    case DOUBLE => in.readDouble()
    case STRING =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    case VECTOR =>
      val n = in.readInt()
      Vector.fill(n)(read(in))
    case LIST =>
      val buf = List.newBuilder[Any]
      var c = in.readUnsignedByte()
      while (c != MARKER) { buf += readBody(in, c); c = in.readUnsignedByte() }
      buf.result()
    case MAP =>
      val n = in.readInt()
      (0 until n).map(_ => (read(in), read(in))).toMap
    case app if app >= 50 && app <= 200 => // application-specific: raw bytes
      val b = new Array[Byte](in.readInt()); in.readFully(b); b
    case other => throw new RuntimeException(s"unknown typed-bytes code $other")
  }

  /** One value; throws EOFException if the stream ends first. */
  def read(in: DataInput): Any =
    readOpt(in).getOrElse(throw new EOFException("typed-bytes: EOF mid-record"))

  /** Streaming records are (key, value) pairs of typed-bytes values. */
  def writePair(out: DataOutput, kv: (Any, Any)): Unit = {
    write(out, kv._1); write(out, kv._2)
  }

  def readPairOpt(in: DataInput): Option[(Any, Any)] =
    readOpt(in).map(k => (k, read(in)))
}
