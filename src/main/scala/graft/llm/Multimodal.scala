package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by typed `mapPartitions`
  * (the Scala-idiomatic equivalent of a vectorized Python UDF — one
  * deserialization per partition batch, case-class Encoders, codegen'd
  * scan underneath).
  *
  * Metadata decode is REAL for PNG/JPEG/GIF/WAV/MP4 ([[ImageHeaders]]
  * parses the container headers directly — pure JVM, no codec library).
  * Pixel-level work is REAL for every format the JDK's built-in ImageIO
  * decodes (PNG, JPEG, GIF, BMP, TIFF — `java.desktop` ships the codecs;
  * no external library): [[JvmImageCodec]] decodes to RGB, resizes by
  * area-averaging, extracts luminance block features, and pulls frames
  * out of multi-frame containers (animated GIF / multi-page TIFF).
  * 16-bit PCM WAV audio gets real per-block RMS energy features
  * ([[WavCodec]]). Only payloads NO JDK codec recognizes (and video
  * beyond the MP4 header — the JDK has no H.264 decoder) fall back to
  * the deterministic byte-level [[FakeCodec]] stand-in, so the operators
  * stay total over arbitrary binary.
  *
  * Scale: payloads stay in executor memory one partition at a time;
  * nothing is collected; decode parallelism = input partitions.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       format: String, n_bytes: Long)
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])
  case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Deterministic fake decoder: width/height from the first 4 payload
    * bytes, format tag from the kind. Replace with a real codec binding
    * in production — the signature is the contract. Kept as the fallback
    * for payloads [[ImageHeaders]] does not recognize, and as the stub
    * behind frame/resize/featurize (pixel decoding needs a codec library
    * this container does not have). */
  object FakeCodec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, String) = {
      def b(i: Int): Int = if (i < payload.length) payload(i) & 0xff else 0
      (b(0) * 256 + b(1), b(2) * 256 + b(3), s"$kind/fake")
    }
  }

  /** Validated RIFF chunk walk shared by the WAV header parser and the
    * PCM feature extractor: yields (tag, dataOffset, dataSize) for each
    * well-formed chunk of a RIFF/WAVE payload. Chunk sizes come from
    * untrusted bytes, so the walk REJECTS any size that is negative or
    * runs past the buffer and stops instead of looping or indexing out
    * of bounds — the operators above promise to stay total over
    * arbitrary binary, corrupt and adversarial payloads included. */
  private[llm] def riffChunks(p: Array[Byte]): Iterator[(String, Int, Int)] = {
    def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
    if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return Iterator.empty
    new Iterator[(String, Int, Int)] {
      private var i = 12
      def hasNext: Boolean = {
        if (i + 8 > p.length) return false
        val sz = (p(i + 4) & 0xffL) | ((p(i + 5) & 0xffL) << 8) |
          ((p(i + 6) & 0xffL) << 16) | ((p(i + 7) & 0xffL) << 24)
        // reject sizes that leave the buffer (also catches the would-be
        // negative .toInt values that made the old walk spin or crash)
        sz <= p.length.toLong - (i + 8)
      }
      def next(): (String, Int, Int) = {
        val sz = ((p(i + 4) & 0xffL) | ((p(i + 5) & 0xffL) << 8) |
          ((p(i + 6) & 0xffL) << 16) | ((p(i + 7) & 0xffL) << 24)).toInt
        val out = (tag(i), i + 8, sz)
        i += 8 + sz + (sz & 1) // chunks are word-aligned
        out
      }
    }
  }

  /** REAL media metadata parsing from the container headers — pure JVM,
    * public-spec formats, no codec library needed. Images return
    * (width, height, mime); WAV returns (sampleRate, channels,
    * "audio/wav"); MP4 returns the first track's (width, height,
    * "video/mp4"). Image formats:
    *   - PNG (RFC 2083 / W3C PNG spec): 8-byte signature
    *     89 50 4E 47 0D 0A 1A 0A, then the IHDR chunk — width at byte
    *     offset 16, height at 20, both 4-byte big-endian.
    *   - JPEG (ITU-T T.81 / JFIF): starts FF D8; segments are
    *     FF <marker> <2-byte big-endian length incl. itself>. Dimensions
    *     live in the frame header (SOFn, markers C0–CF except C4/C8/CC):
    *     precision(1), height(2 BE), width(2 BE) after the length.
    *     Standalone markers (01, D0–D7) carry no length; scan stops at
    *     SOS (DA) / EOI (D9).
    * Returns None for anything else (caller falls back to the stub). */
  object ImageHeaders {
    private def u16(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    private def u32(p: Array[Byte], i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)

    private val pngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def parse(p: Array[Byte]): Option[(Int, Int, String)] =
      parsePng(p).orElse(parseJpeg(p)).orElse(parseGif(p))
        .orElse(parseWav(p)).orElse(parseMp4(p))

    /** GIF (GIF87a/GIF89a, public spec): logical screen width/height as
      * 16-bit little-endian at offsets 6/8. */
    def parseGif(p: Array[Byte]): Option[(Int, Int, String)] = {
      def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      val sig = if (p.length >= 10) new String(p, 0, 6, "US-ASCII") else ""
      if (sig == "GIF87a" || sig == "GIF89a")
        Some((le16(6), le16(8), "image/gif"))
      else None
    }

    def parsePng(p: Array[Byte]): Option[(Int, Int, String)] =
      if (p.length >= 24 && p.startsWith(pngSig) &&
          p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        Some((u32(p, 16).toInt, u32(p, 20).toInt, "image/png"))
      else None

    /** WAV (RIFF, public Microsoft/IBM spec): "RIFF" size "WAVE", then
      * chunks of (4-byte id, 4-byte LE size). The fmt chunk carries
      * channels at offset +2 and sample rate at +4 (both LE). Returned as
      * (sampleRate, channels, "audio/wav") — the (w, h) slots carry the
      * two integers a pipeline partitions/filters on. */
    def parseWav(p: Array[Byte]): Option[(Int, Int, String)] =
      Multimodal.riffChunks(p).collectFirst {
        case (tag, off, sz) if tag == "fmt " && sz >= 16 =>
          val channels = (p(off + 2) & 0xff) | ((p(off + 3) & 0xff) << 8)
          val rate = (p(off + 4) & 0xff) | ((p(off + 5) & 0xff) << 8) |
            ((p(off + 6) & 0xff) << 16) | ((p(off + 7) & 0xff) << 24)
          (rate, channels, "audio/wav")
      }

    /** MP4 / ISO-BMFF (ISO 14496-12, public): a tree of boxes, each
      * (4-byte BE size, 4-byte type). Video dimensions live in
      * moov→trak→tkhd at offsets 76/80 (version-0 box) as 16.16
      * fixed-point — walk the container boxes, take the first track with
      * nonzero dimensions. */
    def parseMp4(p: Array[Byte]): Option[(Int, Int, String)] = {
      def u32b(i: Int): Long =
        ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
          ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
      def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
      if (p.length < 12 || tag(4) != "ftyp") return None
      def walk(from: Int, to: Int): Option[(Int, Int)] = {
        var i = from
        while (i + 8 <= to) {
          val sz = u32b(i)
          if (sz < 8) return None
          val t = tag(i + 4)
          val end = math.min(to.toLong, i + sz).toInt
          if (t == "moov" || t == "trak") {
            val r = walk(i + 8, end)
            if (r.isDefined) return r
          } else if (t == "tkhd" && i + 9 <= end) {
            // payload: ver/flags(4), times+id+reserved+duration (20 for
            // v0, 32 for v1), reserved(8), layer/alt/vol/reserved(8),
            // matrix(36), width(4), height(4)
            val ver = p(i + 8) & 0xff
            val off = if (ver == 1) i + 8 + 4 + 32 + 8 + 8 + 36
                      else i + 8 + 4 + 20 + 8 + 8 + 36
            if (off + 8 <= p.length) {
              val w = (u32b(off) >> 16).toInt     // 16.16 fixed point
              val h = (u32b(off + 4) >> 16).toInt
              if (w > 0 && h > 0) return Some((w, h))
            }
          }
          i = end
        }
        None
      }
      walk(0, p.length).map { case (w, h) => (w, h, "video/mp4") }
    }

    def parseJpeg(p: Array[Byte]): Option[(Int, Int, String)] = {
      if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) return None // desynced — not valid JPEG
        val m = p(i + 1) & 0xff
        m match {
          case 0xff => i += 1 // fill byte before a marker
          case 0x01 => i += 2 // standalone, no length
          case r if r >= 0xd0 && r <= 0xd7 => i += 2 // RSTn, no length
          case 0xd9 | 0xda => return None // EOI / SOS before any SOFn
          case sof if sof >= 0xc0 && sof <= 0xcf &&
              sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
            // SOFn payload: length(2) precision(1) height(2) width(2)
            if (i + 9 >= p.length) return None
            return Some((u16(p, i + 7), u16(p, i + 5), "image/jpeg"))
          case _ =>
            val len = u16(p, i + 2)
            if (len < 2) return None
            i += 2 + len
        }
      }
      None
    }
  }

  /** REAL pixel-level image codec on the JDK's built-in ImageIO readers
    * (`java.desktop` module: PNG, JPEG, GIF, BMP, WBMP, TIFF — public
    * javax.imageio API, no external library). All paths are
    * deterministic: decoding is exact for lossless formats, resampling
    * is integer area-averaging in fixed row-major order, and luminance
    * uses the ITU-R BT.601 integer weights. Every method returns None
    * for payloads no JDK reader accepts — callers fall back to the
    * byte-level stub so operators stay total. */
  object JvmImageCodec {
    // BufferedImage work needs no display; be explicit for executors.
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false) // in-memory, no temp files

    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Accept only payloads with an unambiguous image magic (PNG, JPEG,
      * GIF, BMP, TIFF). The JDK also registers a WBMP reader whose
      * "magic" is two near-arbitrary bytes — without this gate, random
      * binary starting 00 00 would be misdecoded as an image instead of
      * falling back to the byte-level stub. */
    private def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 8 && {
        val (a, b, c, d) = (p(0) & 0xff, p(1) & 0xff, p(2) & 0xff, p(3) & 0xff)
        (a == 0x89 && b == 0x50 && c == 0x4e && d == 0x47) || // PNG
        (a == 0xff && b == 0xd8) ||                           // JPEG
        (a == 'G' && b == 'I' && c == 'F') ||                 // GIF
        (a == 'B' && b == 'M') ||                             // BMP
        (a == 'I' && b == 'I' && c == 0x2a && d == 0x00) ||   // TIFF LE
        (a == 'M' && b == 'M' && c == 0x00 && d == 0x2a)      // TIFF BE
      }

    /** Decode to (width, height, row-major packed ARGB pixels). */
    def decodeArgb(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
      if (!looksLikeImage(payload)) None
      else Option(try ImageIO.read(new ByteArrayInputStream(payload))
                  catch { case _: Exception => null })
        .map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          (w, h, img.getRGB(0, 0, w, h, null, 0, w))
        }

    /** Decode to (width, height, row-major RGB byte triplets). */
    def decodeRgb(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      decodeArgb(payload).map { case (w, h, px) =>
        val rgb = new Array[Byte](px.length * 3)
        var i = 0
        while (i < px.length) {
          rgb(3 * i) = ((px(i) >> 16) & 0xff).toByte
          rgb(3 * i + 1) = ((px(i) >> 8) & 0xff).toByte
          rgb(3 * i + 2) = (px(i) & 0xff).toByte
          i += 1
        }
        (w, h, rgb)
      }

    /** PNG-encode packed ARGB pixels (lossless, deterministic). */
    def encodePng(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, argb, 0, w)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real image downscale by integer `factor`: mean of each
      * factor×factor block per channel (area averaging — the resampler
      * of choice for large downscales), re-encoded as PNG. */
    def resizePng(payload: Array[Byte], factor: Int): Option[Array[Byte]] =
      decodeArgb(payload).map { case (w, h, px) =>
        val (w2, h2) = (math.max(w / factor, 1), math.max(h / factor, 1))
        val out = new Array[Int](w2 * h2)
        var y2 = 0
        while (y2 < h2) {
          var x2 = 0
          while (x2 < w2) {
            var (r, g, b, n) = (0L, 0L, 0L, 0L)
            var y = y2 * factor
            val yHi = math.min(y + factor, h)
            while (y < yHi) {
              var x = x2 * factor
              val xHi = math.min(x + factor, w)
              while (x < xHi) {
                val p = px(y * w + x)
                r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
                n += 1; x += 1
              }
              y += 1
            }
            out(y2 * w2 + x2) =
              (((r / n).toInt << 16) | ((g / n).toInt << 8) | (b / n).toInt)
            x2 += 1
          }
          y2 += 1
        }
        encodePng(w2, h2, out)
      }

    /** `dim` luminance block means in [0,1]: pixels in row-major order
      * split into `dim` equal contiguous runs, BT.601 integer luma
      * (77r + 150g + 29b) >> 8 averaged per run — a real, deterministic
      * image feature vector with the ANN kernels' shape contract. */
    def luminanceFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] =
      decodeArgb(payload).map { case (_, _, px) =>
        Array.tabulate(dim) { i =>
          val lo = (i.toLong * px.length / dim).toInt
          val hi = ((i + 1).toLong * px.length / dim).toInt
          if (hi <= lo) 0f
          else {
            var s = 0L; var j = lo
            while (j < hi) {
              val p = px(j)
              s += (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
                29 * (p & 0xff)) >> 8
              j += 1
            }
            s.toFloat / (hi - lo) / 255f
          }
        }
      }

    /** All frames of a multi-frame container (animated GIF, multi-page
      * TIFF), each re-encoded as a standalone PNG. Single-frame images
      * yield one frame; GIF delta frames come back as the reader stores
      * them (the full-canvas composite is a renderer concern). */
    def frames(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
      if (!looksLikeImage(payload)) return None
      val iis = try ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
                catch { case _: Exception => null }
      if (iis == null) return None
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        reader.setInput(iis, false, true)
        try {
          val n = reader.getNumImages(true)
          Some((0 until n).map { i =>
            val img = reader.read(i)
            val (w, h) = (img.getWidth, img.getHeight)
            encodePng(w, h, img.getRGB(0, 0, w, h, null, 0, w))
          })
        } finally reader.dispose()
      } catch { case _: Exception => None } finally iis.close()
    }
  }

  /** REAL audio feature extraction for 16-bit PCM WAV (RIFF spec, pure
    * JVM): per-block RMS energy over the `data` chunk samples — the
    * standard first-pass audio feature (silence/energy profiling). */
  object WavCodec {
    /** `dim` RMS values in [0,1] over equal contiguous sample blocks
      * (all channels interleaved, as stored). None unless the payload
      * is RIFF/WAVE with 16-bit PCM format and a data chunk. */
    def rmsFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
      val p = payload
      def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      var (fmtOk, dataAt, dataLen) = (false, -1, 0)
      // validated walk: corrupt/adversarial chunk sizes end the scan
      // instead of looping or indexing out of bounds
      Multimodal.riffChunks(p).foreach { case (tag, off, sz) =>
        tag match {
          case "fmt " if sz >= 16 =>
            // audioFormat 1 = PCM; bitsPerSample at data offset +14
            fmtOk = le16(off) == 1 && le16(off + 14) == 16
          case "data" => if (dataAt < 0) { dataAt = off; dataLen = sz }
          case _ =>
        }
      }
      if (!fmtOk || dataAt < 0 || dataLen < 2) return None
      val nSamples = dataLen / 2
      Some(Array.tabulate(dim) { d =>
        val lo = (d.toLong * nSamples / dim).toInt
        val hi = ((d + 1).toLong * nSamples / dim).toInt
        if (hi <= lo) 0f
        else {
          var s = 0.0; var j = lo
          while (j < hi) {
            val v = le16(dataAt + 2 * j).toShort.toDouble / 32768.0
            s += v * v; j += 1
          }
          math.sqrt(s / (hi - lo)).toFloat
        }
      })
    }
  }

  /** Wrap a (id, binary) DataFrame into the typed media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload")).as[MediaRow]
  }

  /** Partition-batched metadata decode: REAL PNG/JPEG header parsing
    * ([[ImageHeaders]] — magic-sniffed, pure JVM), with the deterministic
    * [[FakeCodec]] stub as the fallback for unrecognized payloads. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition prologue ≙ codec init (Mapper.setup analog)
      rows.map { m =>
        val (w, h, fmt) = ImageHeaders.parse(m.payload)
          .getOrElse(FakeCodec.decode(m.kind, m.payload))
        MediaMeta(m.media_id, m.kind, w, h, fmt, m.payload.length.toLong)
      }
    }
  }

  /** Frame extraction (1 → n explode). REAL for multi-frame image
    * containers the JDK decodes (animated GIF, multi-page TIFF): each
    * frame comes back PNG-encoded via [[JvmImageCodec.frames]]. Payloads
    * no reader accepts (e.g. real video — the JDK has no H.264 decoder)
    * fall back to the byte-slice stand-in: every `stride` bytes take a
    * `frameSize`-byte slice, preserving the plumbing shape. */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      JvmImageCodec.frames(m.payload) match {
        case Some(fs) =>
          fs.iterator.zipWithIndex.map { case (f, idx) => Frame(m.media_id, idx, f) }
        case None =>
          Iterator.range(0, math.max(m.payload.length - frameSize + 1, 0), stride)
            .zipWithIndex
            .map { case (off, idx) =>
              Frame(m.media_id, idx, java.util.Arrays.copyOfRange(m.payload, off, off + frameSize))
            }
      }
    }
  }

  /** Downsample by `factor`. REAL for JDK-decodable images: pixel
    * area-averaging, PNG re-encoded ([[JvmImageCodec.resizePng]]).
    * Unrecognized payloads fall back to byte-level block averaging so
    * the operator stays total over arbitrary binary. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val out = JvmImageCodec.resizePng(m.payload, factor).getOrElse {
        val p = m.payload
        Array.tabulate(math.max(p.length / factor, 1)) { i =>
          var s = 0; var j = i * factor
          val hi = math.min(j + factor, p.length)
          val lo = j
          while (j < hi) { s += p(j) & 0xff; j += 1 }
          (s / math.max(hi - lo, 1)).toByte
        }
      }
      MediaRow(m.media_id, m.kind, out)
    }
  }

  /** Fixed-width feature vector per media item — the shape contract for
    * the ANN kernels in [[Embeddings]]. REAL where a JDK codec applies:
    * luminance block means for images ([[JvmImageCodec]]), per-block RMS
    * energy for 16-bit PCM WAV ([[WavCodec]]); mean-byte-per-block
    * fallback for anything else. */
  def featurize(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val feat = JvmImageCodec.luminanceFeatures(m.payload, dim)
        .orElse(WavCodec.rmsFeatures(m.payload, dim))
        .getOrElse {
          val p = m.payload
          Array.tabulate(dim) { i =>
            val lo = (i.toLong * p.length / dim).toInt
            val hi = ((i + 1).toLong * p.length / dim).toInt
            if (hi <= lo) 0f
            else {
              var s = 0L; var j = lo
              while (j < hi) { s += (p(j) & 0xff); j += 1 }
              s.toFloat / (hi - lo)
            }
          }
        }
      MediaFeature(m.media_id, feat)
    }
  }

  /** Exact-INTEGER certificate of the fallback featurizer's block
    * arithmetic: per (media item, block) the byte sum, block length, and
    * the milli-scaled integer mean `1000·sum div len` — the same block
    * boundaries `featurize`'s byte-mean fallback uses
    * (`⌊i·len/dim⌋ … ⌊(i+1)·len/dim⌋`), but with the float division
    * replaced by exact integer arithmetic, so a DuckDB oracle can
    * hash-compare it (the float feature is `sum/len` row-locally — the
    * distributed part, byte blocking over the binary column, is what
    * this certifies). Same exact-regime-twin pattern as
    * `knn_ann_ivf_exh`. */
  def byteBlockStats(media: Dataset[MediaRow], dim: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val p = m.payload
      (0 until dim).map { i =>
        val lo = (i.toLong * p.length / dim).toInt
        val hi = ((i + 1).toLong * p.length / dim).toInt
        var s = 0L; var j = lo
        while (j < hi) { s += (p(j) & 0xff); j += 1 }
        val len = (hi - lo).toLong
        (m.media_id, i.toLong, s, len, if (len == 0) 0L else 1000L * s / len)
      }
    }.toDF("media_id", "dim_idx", "block_sum", "block_len", "value_milli")
  }
}
