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
  * IMAGE kernels are REAL: the JDK's `javax.imageio` codecs (PNG, JPEG,
  * BMP, GIF — pure Java, headless-safe) back metadata decode, pixel
  * resize, and luminance-histogram features. Payloads no reader claims
  * (opaque formats, video containers, raw text) fall back to the
  * deterministic MD5-derived STUB kernels, clearly marked below — the
  * fallback is what a real pipeline does with undecodable blobs anyway
  * (classify, don't crash). Everything around the kernels is the real
  * distributed pattern: binary column + typed schema, `mapPartitions`
  * with one decoder handle per partition (the init-once-per-partition
  * shape a JNI/FFmpeg decoder needs), `Dataset[T]` case-class encoders
  * for the output batch shape, and chunked frame sampling.
  *
  * Scale notes: decode is a narrow per-partition map — no shuffle;
  * metadata decode reads only the image HEADER (`ImageReader.getWidth`
  * never decodes pixels), so the metadata pass is IO-bound, not
  * CPU-bound; partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes` against the binary payload (at
  * 100 TB, keep media blobs in their own table so scans of scalar
  * metadata never drag blob bytes through IO — same motivation as
  * parquet column pruning, checked in MultimodalSpec).
  */
object Multimodal {

  // memory-backed image input streams: the default disk cache writes a temp
  // file per stream — filesystem churn when 32 tasks decode concurrently,
  // and pointless for payloads already held as byte arrays. JVM-global, set
  // ONCE on first use of this object in each driver/executor JVM (every
  // kernel below is a method of this object, so touching one initializes it)
  javax.imageio.ImageIO.setUseCache(false)

  /** Wrap a table into the media shape: (doc_id, media_type, content binary). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("content"))

  /** REAL header-only image decode via the JDK's ImageIO registry:
    * (width, height, format) without touching pixel data. Returns None for
    * payloads no installed reader claims (→ stub fallback). */
  private[multimodal] def realDecode(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally iis.close()
  }

  /** REAL pixel decode (full raster). None when undecodable. */
  private def realImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  // ----------------------------------------------------------------- STUB --
  /** STUB decoder for payloads no real codec claims: derives fake
    * (width, height, format) deterministically from the MD5 of the payload.
    * A production build would route these to a sidecar decoder (video
    * containers, proprietary formats) — here they stay classifiable and
    * deterministic instead of crashing the partition. */
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
    * streamed over the iterator (never materializes a partition in memory).
    * Real header-only ImageIO decode first; stub fallback for payloads no
    * codec claims. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        it.map { case (id, mt, bytes) =>
          val (w, h, f) = realDecode(bytes).getOrElse(stubDecode(bytes, md))
          MediaMeta(id, mt, bytes.length.toLong, w, h, f)
        }
      }
  }

  /** Resize to (width, height). REAL kernel for decodable images:
    * nearest-neighbor pixel resample re-encoded as PNG (nearest, not
    * bilinear, so the output raster is a pure index map of the input —
    * deterministic across JVMs; the PNG bytes are deterministic for a
    * fixed encoder). Undecodable payloads keep the STUB byte resample —
    * same batch shape either way. */
  def resize(media: DataFrame, width: Int, height: Int): Dataset[ResizedMedia] = {
    require(width > 0 && height > 0, s"target dims must be positive: ${width}x$height")
    import media.sparkSession.implicits._
    val outLen = math.max(1, width * height / 64)
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = realImage(bytes) match {
            case Some(img) =>
              val dst = new java.awt.image.BufferedImage(width, height,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < height) { // nearest-neighbor index map — no float blend
                var x = 0
                while (x < width) {
                  dst.setRGB(x, y, img.getRGB(
                    (x.toLong * img.getWidth / width).toInt,
                    (y.toLong * img.getHeight / height).toInt))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              bos.toByteArray
            case None =>
              // STUB: nearest-neighbor byte resample for opaque payloads
              Array.tabulate(outLen) { i =>
                if (bytes.isEmpty) 0.toByte
                else bytes((i.toLong * bytes.length / outLen).toInt)
              }
          }
          ResizedMedia(id, width, height, out)
        }
      }
  }

  /** Feature extraction: payload → fixed-width float vector (the embedding
    * shape ANN operators consume). REAL kernel for decodable images: a
    * `dims`-bin luminance histogram over the raster (integer luma, exact
    * and deterministic). Undecodable payloads keep the STUB byte-histogram
    * so every blob stays featurizable. */
  def extractFeatures(media: DataFrame, dims: Int = 16): Dataset[MediaFeatures] = {
    require(dims > 0, s"dims must be positive, got $dims")
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        it.map { case (id, bytes) =>
          val f = new Array[Float](dims)
          realImage(bytes) match {
            case Some(img) =>
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  // integer ITU-R 601 luma: (77R + 150G + 29B) >> 8, 0..255
                  val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
                    29 * (rgb & 0xff)) >> 8
                  f(luma * dims / 256) += 1f
                  x += 1
                }
                y += 1
              }
            case None =>
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
          }
          MediaFeatures(id, f)
        }
      }
  }

  /** Deterministic synthetic PNGs, one per input row: width
    * 4 + id mod 13, height 4 + 7·id mod 11, gray pixel
    * (31x + 17y + id) mod 256 — REAL image payloads for exercising the
    * ImageIO kernels end-to-end where no binary media table exists. The
    * dimension rule is the oracle contract (generate∘decode = identity);
    * the raster rule pins resize/feature goldens in MultimodalSpec. */
  def synthesizeImages(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (4 + id % 13).toInt
          val h = (4 + (id * 7) % 11).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((31 * x + 17 * y + id) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "content")
      .select(col("doc_id"), lit("image/png").as("media_type"), col("content"))
  }

  /** Deterministic synthetic WAVs (REAL RIFF/PCM payloads via the JDK's
    * `javax.sound.sampled` writer): mono 16-bit, sample rate
    * 8000·(1 + id mod 3), 200 + 37·id mod 600 frames of a square-ish wave.
    * The frame/rate rule is the oracle contract (generate∘decode =
    * identity), making audio a real-codec path like the PNG one. */
  def synthesizeWavs(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          // floorMod: Scala % keeps the sign, and a negative id would
          // otherwise yield a zero sample rate or a negative buffer size
          val rate = (8000 * (1 + java.lang.Math.floorMod(id, 3L))).toInt
          val n = (200 + java.lang.Math.floorMod(id * 37L, 600L)).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) { // deterministic 16-bit samples, little-endian
            val s = (((i * 131 + id * 17) % 65536) - 32768).toInt
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "content")
      .select(col("doc_id"), lit("audio/wav").as("media_type"), col("content"))
  }

  /** REAL header-only audio decode via the JDK's sampled-audio registry:
    * (sample_rate, channels, n_frames) from the RIFF header without
    * touching sample data — the audio counterpart of [[decodeMeta]]'s
    * ImageIO path. Returns None for payloads no installed reader claims.
    * Same distributed shape as every kernel here: per-partition map over
    * in-memory byte arrays, no shuffle. */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val f = ais.getFormat
            (id, f.getSampleRate.toInt, f.getChannels, ais.getFrameLength)
          } finally ais.close()
        } catch { // classify, don't crash — the undecodable-payload rule.
          // Catch-all like the image path: third-party AudioFileReader
          // SPIs throw raw IOExceptions on malformed payloads
          case scala.util.control.NonFatal(_) => (id, -1, -1, -1L)
        }
      }.toDF("doc_id", "sample_rate", "channels", "n_frames")
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
