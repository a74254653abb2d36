package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables
import graft.llm.Multimodal
import graft.sources.{FixedWidth, SequenceFiles}

/** Counters, multimodal plumbing, fixed-width + SequenceFile sources. */
class InfraSpec extends SparkTestBase {

  test("user counters tick through a typed pipeline; report collects them") {
    import spark.implicits._
    val reg = Counters.registry(spark)
    val seen = reg.counter("graft", "docs_seen")
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)]
    val n = docs.map(Counters.tick(seen)).filter(_._2.nonEmpty).count()
    assert(seen.value == docs.count())
    assert(n > 0)
    val rep = reg.report.collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(rep("docs_seen") == seen.value)
  }

  test("framework task metrics captured around an action (TaskCounter analog)") {
    val (_, metrics) = Counters.withTaskMetrics(spark) {
      Tables.lineitem(spark, sf0001).groupBy(col("l_returnflag")).count().collect()
    }
    assert(metrics("input_records") > 0)
  }

  test("multimodal decode/frames/featurize plumbing over binary payloads") {
    import spark.implicits._
    val media = Multimodal.asMedia(
      Seq((1L, "ABCDEFGHIJKLMNOP")).toDF("id", "s")
        .select($"id", $"s".cast("binary").as("payload")),
      "id", "payload", "audio")
    val meta = Multimodal.decodeMeta(media).collect().head
    assert(meta.width == 'A' * 256 + 'B' && meta.height == 'C' * 256 + 'D')
    assert(meta.format == "audio/fake" && meta.n_bytes == 16)

    val frames = Multimodal.sampleFrames(media, frameSize = 4, stride = 8).collect()
    assert(frames.length == 2)
    assert(new String(frames(0).frame) == "ABCD" && new String(frames(1).frame) == "IJKL")

    val feats = Multimodal.featurize(media, dim = 4).collect().head
    assert(feats.feature.length == 4)
    assert(feats.feature(0) == ('A' + 'B' + 'C' + 'D').toFloat / 4)
  }

  test("multimodal decodeMeta parses REAL PNG and JPEG headers (ImageIO fixtures)") {
    import spark.implicits._
    // fixtures come from the JDK's own encoders — real container bytes,
    // not hand-mimicked magic
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = encode("png", 17, 9)
    val jpg = encode("jpg", 31, 23)
    assert(Multimodal.ImageHeaders.parse(png).contains((17, 9, "image/png")))
    assert(Multimodal.ImageHeaders.parse(jpg).contains((31, 23, "image/jpeg")))

    // progressive JPEG (SOF2 frame header) — hand-rolled minimal segments:
    // SOI, APP0(JFIF), SOF2 with precision 8, height 300, width 500, 1 comp
    val sof2 = Array[Int](
      0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xc2, 0x00, 0x0b, 8, 0x01, 0x2c, 0x01, 0xf4, 1, 1, 0x11, 0
    ).map(_.toByte)
    assert(Multimodal.ImageHeaders.parse(sof2).contains((500, 300, "image/jpeg")))

    val gif = encode("gif", 13, 7)
    assert(Multimodal.ImageHeaders.parse(gif).contains((13, 7, "image/gif")))

    // WAV via the JDK's own RIFF encoder: 22.05 kHz mono
    val wavBytes = {
      val fmt = new javax.sound.sampled.AudioFormat(22050f, 16, 1, true, false)
      val pcm = new Array[Byte](2048)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Multimodal.ImageHeaders.parse(wavBytes).contains((22050, 1, "audio/wav")))

    // MP4: minimal ISO-BMFF box tree ftyp + moov{trak{tkhd v0}} with a
    // 640x360 track (16.16 fixed-point dimensions)
    val mp4 = {
      val bb = java.nio.ByteBuffer.allocate(200) // BE by default
      def box(tag: String, payload: Int): Unit = {
        bb.putInt(8 + payload); bb.put(tag.getBytes("US-ASCII"))
      }
      box("ftyp", 8); bb.put("isom".getBytes); bb.putInt(0)
      val tkhdPayload = 4 + 20 + 8 + 8 + 36 + 8
      box("moov", 8 + 8 + tkhdPayload)
      box("trak", 8 + tkhdPayload)
      box("tkhd", tkhdPayload)
      bb.putInt(0)                       // version 0 + flags
      (0 until (20 + 8 + 8 + 36) / 4).foreach(_ => bb.putInt(0))
      bb.putInt(640 << 16); bb.putInt(360 << 16)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    assert(Multimodal.ImageHeaders.parse(mp4).contains((640, 360, "video/mp4")))

    // non-media payloads fall back to the deterministic stub
    assert(Multimodal.ImageHeaders.parse("plain text".getBytes("UTF-8")).isEmpty)

    // end-to-end through the typed Spark surface
    val media = Multimodal.asMedia(
      Seq((7L, png), (8L, jpg), (9L, "text bytes only".getBytes("UTF-8")))
        .toDF("id", "payload"),
      "id", "payload", "image")
    val metas = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> ((m.width, m.height, m.format))).toMap
    assert(metas(7L) == ((17, 9, "image/png")))
    assert(metas(8L) == ((31, 23, "image/jpeg")))
    assert(metas(9L)._3 == "image/fake") // stub fallback, real plumbing
  }

  test("multimodal resize downsamples payloads with block averaging") {
    import spark.implicits._
    val media = Multimodal.asMedia(
      Seq((1L, Array[Byte](0, 2, 4, 6, 8, 10))).toDF("id", "payload"),
      "id", "payload", "image")
    val out = Multimodal.resize(media, factor = 2).collect().head
    assert(out.payload.toSeq == Seq[Byte](1, 5, 9)) // pairwise means
  }

  test("CSV and JSON-lines format roundtrips with options") {
    import spark.implicits._
    val df = Seq((1L, "a|b", 1.5), (2L, "c", 2.5)).toDF("id", "s", "v")
    val csvPath = Files.createTempDirectory("csv").resolve("out").toString
    df.write.option("sep", ";").option("header", "true").csv(csvPath)
    val backCsv = spark.read.option("sep", ";").option("header", "true")
      .option("inferSchema", "true").csv(csvPath)
    assert(backCsv.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a|b"), (2, "c")))

    val jsonPath = Files.createTempDirectory("json").resolve("out").toString
    df.write.json(jsonPath)
    val backJson = spark.read.json(jsonPath)
    assert(backJson.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 1.5), (2L, 2.5)))
  }

  test("ORC roundtrip preserves types and pushes filters to the reader") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "s", "v")
    val path = Files.createTempDirectory("orc").resolve("out").toString
    df.write.orc(path)
    val back = spark.read.orc(path).filter($"id" > 1L)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == Set((2L, "b", 2.5), (3L, "c", 3.5)))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"), plan)
  }

  test("fixed-width source slices records with correct offsets (Tera layout)") {
    val dir = Files.createTempDirectory("fixedw").toFile
    val f = new java.io.File(dir, "data.bin")
    val recs = (0 until 7).map(i => (f"k$i%09d" + "v" * 90).getBytes("UTF-8"))
    Files.write(f.toPath, recs.flatten.toArray)
    val df = FixedWidth.readTera(spark, f.getAbsolutePath)
    val rows = df.orderBy(col("offset")).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getLong(0)).toSeq == (0 until 7).map(_ * 100L))
    assert(new String(rows(3).getAs[Array[Byte]]("key")) == "k000000003")
    assert(rows.forall(_.getAs[Array[Byte]]("value").length == 90))
  }

  test("JDBC roundtrip with range-partitioned read (DBInputFormat parity, embedded Derby)") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = (1L to 100L).map(i => (i, s"name$i", i * 10.0)).toDF("id", "name", "score")
    graft.sources.Jdbc.write(df, url, "people")
    val back = graft.sources.Jdbc.readPartitioned(spark, url, "people",
      partitionColumn = "id", lowerBound = 1, upperBound = 100, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4) // DataDrivenDBInputFormat range splits
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum($"score"))
      .first().getDouble(0) == (1 to 100).map(_ * 10.0).sum)
  }

  test("compression codecs: gzip and bzip2 text roundtrip (splittable bzip2)") {
    import spark.implicits._
    for (codec <- Seq("gzip", "bzip2")) { // text codecs
      val path = Files.createTempDirectory(s"codec_$codec").resolve("out").toString
      val lines = (1 to 500).map(i => s"line-$i")
      lines.toDF("value").write.option("compression", codec).text(path)
      val back = spark.read.text(path).collect().map(_.getString(0)).toSet
      assert(back == lines.toSet, codec)
    }
    for (codec <- Seq("zstd", "snappy", "gzip")) { // parquet codecs
      val path = Files.createTempDirectory(s"pq_$codec").resolve("out").toString
      (1L to 100L).toDF("id").write.option("compression", codec).parquet(path)
      assert(spark.read.parquet(path).count() == 100, codec)
    }
  }

  test("custom RDD Partitioner (user Partitioner hook, CORE Partitioner.java:42)") {
    val custom = new org.apache.spark.Partitioner {
      override def numPartitions: Int = 4
      // the reference's getPartition contract: any deterministic key fn
      override def getPartition(key: Any): Int =
        (key.asInstanceOf[Long] % 7 % 4).toInt
    }
    val rdd = spark.sparkContext.parallelize(1L to 1000L, 8)
      .map(x => (x, x * 2))
      .partitionBy(custom)
    val placement = rdd.mapPartitionsWithIndex { (pid, it) =>
      it.map { case (k, _) => (pid, (k % 7 % 4).toInt) }
    }.collect()
    assert(placement.nonEmpty && placement.forall { case (pid, want) => pid == want })
  }

  test("SequenceFile write/read roundtrip (Text/LongWritable interop)") {
    import spark.implicits._
    val out = Files.createTempDirectory("seqf").resolve("wc").toString
    val df = Seq(("alpha", 3L), ("beta", 5L), ("gamma", 1L)).toDF("key", "value")
    SequenceFiles.writeTextLong(df, out)
    val back = SequenceFiles.readTextLong(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(back == Set(("alpha", 3L), ("beta", 5L), ("gamma", 1L)))
  }

  test("SequenceFile BLOCK-compression write: on-disk block framing, lossless roundtrip") {
    import spark.implicits._
    val out = Files.createTempDirectory("seqb").resolve("wc").toString
    val rows = (0 until 500).map(i => (s"word$i", i.toLong))
    SequenceFiles.writeTextLongBlock(rows.toDF("key", "value"), out)
    // the on-disk framing really is BLOCK mode, per the container header —
    // not just a compressed variant of the default record framing
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(out)
    val part = dir.getFileSystem(conf).listStatus(dir)
      .map(_.getPath).filter(_.getName.startsWith("part")).head
    val reader = new org.apache.hadoop.io.SequenceFile.Reader(
      conf, org.apache.hadoop.io.SequenceFile.Reader.file(part))
    try {
      assert(reader.isBlockCompressed, "expected BLOCK compression framing")
      assert(reader.getCompressionCodec != null)
    } finally reader.close()
    // the standard reader path decodes it identically to record framing
    val back = SequenceFiles.readTextLong(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(back == rows.toSet)
  }
}
