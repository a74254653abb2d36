package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by typed `mapPartitions`
  * (the Scala-idiomatic equivalent of a vectorized Python UDF — one
  * deserialization per partition batch, case-class Encoders, codegen'd
  * scan underneath).
  *
  * The actual media codecs are STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] is a deterministic stand-in that "parses" a
  * header from the first payload bytes. The Spark-side plumbing — schema,
  * binary payload handling, partition-batched decode, frame sampling,
  * feature extraction shape — is real and tested; swapping FakeCodec for
  * a JNI/javacv decoder changes no plan shape.
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
    * in production — the signature is the contract. */
  object FakeCodec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, String) = {
      def b(i: Int): Int = if (i < payload.length) payload(i) & 0xff else 0
      (b(0) * 256 + b(1), b(2) * 256 + b(3), s"$kind/fake")
    }
  }

  /** Wrap a (id, binary) DataFrame into the typed media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload")).as[MediaRow]
  }

  /** Partition-batched metadata decode. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition prologue ≙ codec init (Mapper.setup analog)
      rows.map { m =>
        val (w, h, fmt) = FakeCodec.decode(m.kind, m.payload)
        MediaMeta(m.media_id, m.kind, w, h, fmt, m.payload.length.toLong)
      }
    }
  }

  /** Frame sampling: every `stride` bytes take a `frameSize`-byte slice —
    * the plumbing shape of video frame extraction (1 → n explode). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      Iterator.range(0, math.max(m.payload.length - frameSize + 1, 0), stride)
        .zipWithIndex
        .map { case (off, idx) =>
          Frame(m.media_id, idx, java.util.Arrays.copyOfRange(m.payload, off, off + frameSize))
        }
    }
  }

  /** Resize (stub): block-average downsample of the payload by `factor`
    * — the byte-level stand-in for image resizing; output metadata
    * reflects the new dimensions like a real resampler would. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val p = m.payload
      val out = Array.tabulate(math.max(p.length / factor, 1)) { i =>
        var s = 0; var j = i * factor
        val hi = math.min(j + factor, p.length)
        val lo = j
        while (j < hi) { s += p(j) & 0xff; j += 1 }
        (s / math.max(hi - lo, 1)).toByte
      }
      MediaRow(m.media_id, m.kind, out)
    }
  }

  /** Fixed-width feature vector per media item (stub featurizer: mean
    * byte value per equal-size block — deterministic, right output shape
    * for the ANN kernels in [[Embeddings]]). */
  def featurize(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val p = m.payload
      val feat = Array.tabulate(dim) { i =>
        val lo = (i.toLong * p.length / dim).toInt
        val hi = ((i + 1).toLong * p.length / dim).toInt
        if (hi <= lo) 0f
        else {
          var s = 0L; var j = lo
          while (j < hi) { s += (p(j) & 0xff); j += 1 }
          s.toFloat / (hi - lo)
        }
      }
      MediaFeature(m.media_id, feat)
    }
  }
}
