package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Decoded media metadata (one row per media object). */
case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, format: String)

/** One sampled frame of a media object. */
case class MediaFrame(doc_id: Long, frame_no: Int, frame_bytes: Array[Byte])

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
