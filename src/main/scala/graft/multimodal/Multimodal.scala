package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Decoded media metadata (one row per media object). */
case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, format: String)

/** One sampled frame of a media object. */
case class MediaFrame(doc_id: Long, frame_no: Int, frame_bytes: Array[Byte])

/** A resized media payload with its new nominal dimensions. */
case class ResizedMedia(doc_id: Long, width: Int, height: Int, content: Array[Byte])

/** A fixed-width feature vector extracted from a media payload. */
case class MediaFeatures(doc_id: Long, features: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition imperative decoders.
  *
  * The decode kernel itself is a STUB — real image/audio libraries are not in
  * this container — replaced by a deterministic MD5-derived fake, clearly
  * marked below. Everything around it is the real distributed pattern:
  * binary column + typed schema, `mapPartitions` with one decoder handle per
  * partition (the init-once-per-partition shape a JNI/FFmpeg decoder needs),
  * `Dataset[T]` case-class encoders for the output batch shape, and
  * chunked frame sampling. Swapping the fake for a real decoder changes only
  * the marked lines.
  *
  * Scale notes: decode is a narrow per-partition map — no shuffle; partition
  * sizing is governed by `spark.sql.files.maxPartitionBytes` against the
  * binary payload (at 100 TB, keep media blobs in their own table so scans of
  * scalar metadata never drag blob bytes through IO — same motivation as
  * parquet column pruning, checked in MultimodalSpec).
  */
object Multimodal {

  /** Wrap a table into the media shape: (doc_id, media_type, content binary). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("content"))

  // ----------------------------------------------------------------- STUB --
  /** STUB decoder: derives fake (width, height, format) deterministically
    * from the MD5 of the payload. A real build replaces this body with the
    * actual image/audio decode (e.g. via a JNI handle created per partition). */
  private[multimodal] def stubDecode(bytes: Array[Byte], md: java.security.MessageDigest)
      : (Int, Int, String) = {
    md.reset()
    val hex = md.digest(bytes).take(4).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex, 16)
    val format = (v % 3) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    ((v % 1920).toInt, ((v >> 8) % 1080).toInt, format)
  }
  // -------------------------------------------------------------------------

  /** Decode metadata for every media row: one decoder handle per partition,
    * streamed over the iterator (never materializes a partition in memory). */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        it.map { case (id, mt, bytes) =>
          val (w, h, f) = stubDecode(bytes, md)
          MediaMeta(id, mt, bytes.length.toLong, w, h, f)
        }
      }
  }

  /** Resize to (width, height): the per-partition imperative transform a
    * real image library would perform. STUB kernel: deterministic byte
    * down/up-sampling to `width*height/64` bytes — the batch shape (binary
    * in, binary + new dims out, one handle per partition) is the real
    * pattern; only the marked line changes with a real resampler. */
  def resize(media: DataFrame, width: Int, height: Int): Dataset[ResizedMedia] = {
    require(width > 0 && height > 0, s"target dims must be positive: ${width}x$height")
    import media.sparkSession.implicits._
    val outLen = math.max(1, width * height / 64)
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: nearest-neighbor byte resample stands in for pixel resample
          val out = Array.tabulate(outLen) { i =>
            if (bytes.isEmpty) 0.toByte else bytes((i.toLong * bytes.length / outLen).toInt)
          }
          ResizedMedia(id, width, height, out)
        }
      }
  }

  /** Feature extraction: payload → fixed-width float vector (the embedding
    * shape ANN operators consume). STUB kernel: per-dimension byte-histogram
    * projection seeded by MD5 — deterministic, length-stable; a real build
    * swaps in a vision/audio model invocation per partition batch. */
  def extractFeatures(media: DataFrame, dims: Int = 16): Dataset[MediaFeatures] = {
    require(dims > 0, s"dims must be positive, got $dims")
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        it.map { case (id, bytes) =>
          val f = new Array[Float](dims)
          var i = 0
          while (i < bytes.length) { // STUB: signed-byte accumulation per lane
            f(i % dims) += bytes(i)
            i += 1
          }
          md.reset()
          val h = md.digest(bytes)
          var j = 0
          while (j < dims) { // salt with the payload hash so empty ≠ absent
            f(j) += (h(j % h.length) & 0x0f)
            j += 1
          }
          MediaFeatures(id, f)
        }
      }
  }

  /** Sample every `stride`-th fixed-size chunk of the payload as a "frame"
    * (the video-frame-sampling batch shape; chunking replaces real codec
    * framing in the stub). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 => MediaFrame(id, i, chunk)
        }
      }
  }
}
