package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TypedBytesSpec extends SparkTestBase {

  private def roundtrip(v: Any): Any = {
    val bos = new ByteArrayOutputStream()
    TypedBytes.write(new DataOutputStream(bos), v)
    TypedBytes.read(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
  }

  test("all eleven type tags roundtrip, including nested containers") {
    assert(java.util.Arrays.equals(
      roundtrip(Array[Byte](1, 2, -3)).asInstanceOf[Array[Byte]],
      Array[Byte](1, 2, -3)))
    assert(roundtrip(42.toByte) == 42.toByte)
    assert(roundtrip(true) == true)
    assert(roundtrip(123456) == 123456)
    assert(roundtrip(-9876543210L) == -9876543210L)
    assert(roundtrip(1.5f) == 1.5f)
    assert(roundtrip(math.Pi) == math.Pi)
    assert(roundtrip("héllo wörld") == "héllo wörld")
    assert(roundtrip(Vector(1, 2L, "three")) == Vector(1, 2L, "three"))
    assert(roundtrip(List("a", false, 7)) == List("a", false, 7))
    assert(roundtrip(Map("k" -> 1L, "j" -> 2L)) == Map("k" -> 1L, "j" -> 2L))
    // deep nesting: map of vectors of lists
    val nested = Map("xs" -> Vector(List(1, 2), List(3)), "n" -> 9L)
    assert(roundtrip(nested) == nested)
  }

  test("wire framing matches the published spec byte-for-byte") {
    val bos = new ByteArrayOutputStream()
    TypedBytes.write(new DataOutputStream(bos), "ab")
    // STRING = 0x07, 4-byte BE length, UTF-8 bytes
    assert(bos.toByteArray.toSeq == Seq[Byte](7, 0, 0, 0, 2, 'a', 'b'))
    val bos2 = new ByteArrayOutputStream()
    TypedBytes.write(new DataOutputStream(bos2), 5L)
    assert(bos2.toByteArray.toSeq == Seq[Byte](4, 0, 0, 0, 0, 0, 0, 0, 5))
    val bos3 = new ByteArrayOutputStream()
    TypedBytes.write(new DataOutputStream(bos3), List(1))
    // LIST = 0x09, elements, MARKER 0xFF
    assert(bos3.toByteArray.toSeq == Seq[Byte](9, 3, 0, 0, 0, 1, -1))
  }

  test("binary pipe through cat: nested typed-bytes pairs survive intact") {
    import spark.implicits._
    val df = Seq(("k1", Seq(1L, 2L, 3L)), ("k2", Seq(9L)))
      .toDF("key", "value").repartition(2)
    val frames = Pipes.pipeTypedBytesRaw(df, Seq("cat")).collect()
    val decoded = frames.map { bytes =>
      TypedBytes.readPairOpt(
        new DataInputStream(new ByteArrayInputStream(bytes))).get
    }.map { case (k, v) => (k.asInstanceOf[String], v) }.toMap
    assert(decoded("k1") == Vector(1L, 2L, 3L))
    assert(decoded("k2") == Vector(9L))
  }

  test("typed-bytes python reducer wordcount equals DataFrame wordcount") {
    import spark.implicits._
    val docs = Seq("a b a", "b c", "a").toDF("text")
    val words = docs.select(explode(split(col("text"), " ")).as("k"))
      .withColumn("v", lit(1L))
      .repartition(3, col("k")).sortWithinPartitions(col("k"))
    val res = Pipes.pipeTypedBytes(words,
        Seq("python3", "-c", pyReducerForTest))
      .as[(String, Long)].collect().toSet
    assert(res == Set(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("dump/load: SequenceFile -> typed-bytes stream -> SequenceFile") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tb").toString
    val data = Seq(("alpha", 1L), ("beta", 2L), ("gamma", 3L))
    graft.sources.SequenceFiles.writeTextLong(
      data.toDF("key", "value"), s"$dir/seq_in")
    val bos = new ByteArrayOutputStream()
    val n = graft.sources.TypedBytesFiles.dump(spark, s"$dir/seq_in", bos)
    assert(n == 3)
    val m = graft.sources.TypedBytesFiles.load(spark,
      new ByteArrayInputStream(bos.toByteArray), s"$dir/seq_out")
    assert(m == 3)
    val back = graft.sources.SequenceFiles.readTextLong(spark, s"$dir/seq_out")
      .as[(String, Long)].collect().toSet
    assert(back == data.toSet)
  }

  private val pyReducerForTest: String =
    """import sys, struct
      |ri, wo = sys.stdin.buffer, sys.stdout.buffer
      |def rv():
      |    t = ri.read(1)
      |    if not t: return None
      |    t = t[0]
      |    if t == 7:
      |        n = struct.unpack('>i', ri.read(4))[0]
      |        return ri.read(n).decode('utf-8')
      |    if t == 4: return struct.unpack('>q', ri.read(8))[0]
      |    raise SystemExit('bad tag %d' % t)
      |def w(k, v):
      |    kb = k.encode('utf-8')
      |    wo.write(b'\x07' + struct.pack('>i', len(kb)) + kb)
      |    wo.write(b'\x04' + struct.pack('>q', v))
      |prev, s = None, 0
      |while True:
      |    k = rv()
      |    if k is None: break
      |    v = rv()
      |    if prev is not None and k != prev:
      |        w(prev, s); s = 0
      |    prev = k; s += v
      |if prev is not None: w(prev, s)
      |wo.flush()
      |""".stripMargin
}
