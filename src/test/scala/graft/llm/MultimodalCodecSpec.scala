package graft.llm

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO}

import graft.SparkTestBase
import graft.llm.Multimodal.{ImageHeaders, JvmImageCodec, WavCodec}

/** REAL pixel/sample-level codec paths: JDK ImageIO decode, area-average
  * resize, luminance features, multi-frame extraction, WAV RMS energy —
  * plus the Dataset-level operators taking the real path when payloads
  * are genuine media. */
class MultimodalCodecSpec extends SparkTestBase {

  private def png(w: Int, h: Int, rgb: Int => Int): Array[Byte] =
    JvmImageCodec.encodePng(w, h, Array.tabulate(w * h)(rgb))

  test("decodeRgb roundtrips exact pixels through a PNG") {
    val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0x123456)
    val bytes = png(2, 2, colors)
    val Some((w, h, rgb)) = JvmImageCodec.decodeRgb(bytes)
    assert((w, h) == (2, 2))
    val decoded = rgb.grouped(3).map { t =>
      ((t(0) & 0xff) << 16) | ((t(1) & 0xff) << 8) | (t(2) & 0xff)
    }.toArray
    assert(decoded.sameElements(colors)) // PNG is lossless — exact
  }

  test("decodeRgb handles JPEG (lossy: constant color within tolerance)") {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 16, 16, Array.fill(256)(0x808080), 0, 16)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    val Some((w, h, rgb)) = JvmImageCodec.decodeRgb(bos.toByteArray)
    assert((w, h) == (16, 16))
    assert(rgb.forall(b => math.abs((b & 0xff) - 0x80) <= 2))
  }

  test("resizePng area-averages pixel blocks, not payload bytes") {
    // 6x2, left 3 columns red, right 3 blue; factor-2 blocks:
    // [red red][red blue][blue blue] -> middle block averages to purple
    val bytes = png(6, 2, i => if (i % 6 < 3) 0xff0000 else 0x0000ff)
    val Some(small) = JvmImageCodec.resizePng(bytes, 2)
    assert(ImageHeaders.parsePng(small).contains((3, 1, "image/png")))
    val Some((_, _, rgb)) = JvmImageCodec.decodeRgb(small)
    val px = rgb.grouped(3).map(t => (t(0) & 0xff, t(1) & 0xff, t(2) & 0xff)).toSeq
    assert(px == Seq((255, 0, 0), (127, 0, 127), (0, 0, 255)))
  }

  test("luminanceFeatures: BT.601 integer luma of constant gray is exact") {
    // (77+150+29) = 256, so luma((g,g,g)) == g exactly
    val bytes = png(10, 10, _ => 0x646464) // gray 100
    val Some(feat) = JvmImageCodec.luminanceFeatures(bytes, 4)
    assert(feat.length == 4 && feat.forall(_ == 100f / 255f))
  }

  test("codec paths reject non-media payloads (fallback contract)") {
    val junk = "not an image at all, just text".getBytes("UTF-8")
    assert(JvmImageCodec.decodeRgb(junk).isEmpty)
    assert(JvmImageCodec.resizePng(junk, 2).isEmpty)
    assert(JvmImageCodec.frames(junk).isEmpty)
    assert(WavCodec.rmsFeatures(junk, 4).isEmpty)
  }

  test("adversarial RIFF payloads: corrupt chunk sizes neither hang nor throw") {
    def riff(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val buf = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      buf.array()
    }
    def chunk(tag: String, size: Int, dataLen: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(tag.getBytes("US-ASCII")).putInt(size)
        .put(new Array[Byte](dataLen))
      buf.array()
    }
    // size 0xFFFFFFF8 → old walk advanced by 0 (infinite loop);
    // 0xFFFFFFF0 walked backwards (index crash); huge positive size
    // runs past the buffer. All must now scan as "no valid chunk".
    for (bad <- Seq(0xFFFFFFF8, 0xFFFFFFF0, Int.MaxValue)) {
      val p = riff(chunk("JUNK", bad, 16))
      assert(Multimodal.ImageHeaders.parseWav(p).isEmpty)
      assert(WavCodec.rmsFeatures(p, 4).isEmpty)
    }
    // fmt chunk whose declared size would satisfy a naive length guard
    // but whose data runs past the payload end: rejected, not read
    val truncated = riff(chunk("fmt ", 16, 4))
    assert(Multimodal.ImageHeaders.parseWav(truncated).isEmpty)
    assert(WavCodec.rmsFeatures(truncated, 4).isEmpty)
    // undersized fmt chunk (sz < 16): spec-invalid, skipped
    val tiny = riff(chunk("fmt ", 8, 8))
    assert(Multimodal.ImageHeaders.parseWav(tiny).isEmpty)
  }

  test("adversarial MP4: 8-byte tkhd box at buffer end does not throw") {
    val buf = java.nio.ByteBuffer.allocate(24)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII")).put(new Array[Byte](8))
    buf.putInt(8).put("tkhd".getBytes("US-ASCII")) // box ends AT p.length
    assert(Multimodal.ImageHeaders.parseMp4(buf.array()).isEmpty)
  }

  test("frames extracts every page of a multi-page TIFF as PNG") {
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val grays = Seq(0x202020, 0x808080, 0xe0e0e0)
    grays.foreach { g =>
      val img = new BufferedImage(5, 4, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 5, 4, Array.fill(20)(g), 0, 5)
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()

    val Some(frames) = JvmImageCodec.frames(bos.toByteArray)
    assert(frames.length == 3)
    frames.zip(grays).foreach { case (f, g) =>
      assert(ImageHeaders.parsePng(f).contains((5, 4, "image/png")))
      val Some((_, _, rgb)) = JvmImageCodec.decodeRgb(f)
      assert((rgb(0) & 0xff) == ((g >> 16) & 0xff))
    }
  }

  test("WavCodec.rmsFeatures: half-scale square wave has RMS exactly 0.5") {
    val nSamples = 800
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until nSamples).foreach { i =>
      buf.putShort(if (i % 2 == 0) 16384 else -16384)
    }
    val Some(feat) = WavCodec.rmsFeatures(buf.array(), 4)
    assert(feat.length == 4 && feat.forall(f => math.abs(f - 0.5f) < 1e-6f))
  }

  test("multimodal_pixels query: decoded values equal the arithmetic oracle") {
    val rows = graft.SparkEntry.queries("multimodal_pixels")(spark, sf0001)
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h, g) = ((id % 13 + 2).toInt, (id % 7 + 2).toInt, (id % 251).toInt)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == (w, h, w * h))
      assert(r.getInt(4) == g)                       // PNG decode is exact
      assert((r.getInt(5), r.getInt(6)) == (w / 2, h / 2))
      assert(r.getInt(7) == g)                       // area-avg of constant
    }
  }

  test("Dataset operators take the real path for genuine media payloads") {
    import spark.implicits._
    val gray = png(8, 6, _ => 0x646464)
    val media = Multimodal.asMedia(
      Seq((1L, gray)).toDF("id", "payload"), "id", "payload", "image")

    // featurize: luminance path (100/255), not byte means over PNG bytes
    val feat = Multimodal.featurize(media, dim = 4).collect().head
    assert(feat.feature.forall(_ == 100f / 255f))

    // resize: output is a real PNG with halved dimensions
    val resized = Multimodal.resize(media, factor = 2).collect().head
    assert(ImageHeaders.parsePng(resized.payload).contains((4, 3, "image/png")))

    // decodeMeta still reads the container header
    val meta = Multimodal.decodeMeta(media).collect().head
    assert((meta.width, meta.height, meta.format) == (8, 6, "image/png"))

    // sampleFrames on a single-frame PNG: one real frame, PNG-encoded
    val frames = Multimodal.sampleFrames(media, frameSize = 4, stride = 8).collect()
    assert(frames.length == 1)
    assert(ImageHeaders.parsePng(frames.head.frame).contains((8, 6, "image/png")))
  }
}
