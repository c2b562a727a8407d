package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Multimodal plumbing: binary column handling, per-partition decode batch
  * shape, frame sampling, and metadata-scan column pruning. */
class MultimodalSpec extends AnyFunSuite with SparkSpecBase {

  private def media = Multimodal.asMediaTable(
    df("doc_id INT, text STRING",
      Row(Int.box(1), "hello world"), Row(Int.box(2), "")), "doc_id", "text", "text/plain")

  test("decodeMeta emits one typed row per media object; stub is deterministic") {
    val out = Multimodal.decodeMeta(media).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out(0).n_bytes == 11 && out(1).n_bytes == 0)
    assert(out.forall(m => m.width >= 0 && m.width < 1920 && m.height >= 0 && m.height < 1080))
    assert(out.forall(m => Set("jpeg", "png", "webp")(m.format)))
    // deterministic across runs
    assert(Multimodal.decodeMeta(media).collect().sortBy(_.doc_id).toSeq == out.toSeq)
  }

  test("decode matches the documented md5 formula (oracle contract)") {
    val m = Multimodal.decodeMeta(media).filter(col("doc_id") === 1).head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex, 16)
    assert(m.width == (v % 1920).toInt && m.height == ((v >> 8) % 1080).toInt)
  }

  test("sampleFrames chunks the payload and keeps every stride-th frame") {
    val one = Multimodal.asMediaTable(
      df("doc_id INT, text STRING", Row(Int.box(9), "abcdefghij")), "doc_id", "text", "video/fake")
    val frames = Multimodal.sampleFrames(one, frameBytes = 3, stride = 2)
      .collect().sortBy(_.frame_no)
    // chunks: abc def ghi j → frames 0,2 kept
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2))
    assert(frames.map(f => new String(f.frame_bytes, "UTF-8")).toSeq == Seq("abc", "ghi"))
  }

  test("resize produces deterministic fixed-size payloads with target dims") {
    val out = Multimodal.resize(media, 64, 64).collect().sortBy(_.doc_id)
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(_.content.length == 64 * 64 / 64))
    val again = Multimodal.resize(media, 64, 64).collect().sortBy(_.doc_id)
    assert(out.zip(again).forall { case (a, b) => a.content.sameElements(b.content) })
    assertThrows[IllegalArgumentException](Multimodal.resize(media, 0, 64))
  }

  test("extractFeatures yields fixed-width deterministic vectors; empty differs from absent") {
    val out = Multimodal.extractFeatures(media, dims = 8).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out.forall(_.features.length == 8))
    // empty payload still has a (hash-salted) non-trivial vector
    assert(out(1).features.exists(_ != 0.0f))
    assert(!out(0).features.sameElements(out(1).features))
  }

  test("real codec: synthesized PNGs decode to the rule dims via ImageIO, not the stub") {
    val ids = df("doc_id BIGINT", (0L until 30L).map(i => Row(Long.box(i))): _*)
    val m = Multimodal.synthesizeImages(ids, "doc_id")
    val out = Multimodal.decodeMeta(m).collect().sortBy(_.doc_id)
    assert(out.length == 30)
    out.foreach { r =>
      assert(r.format == "png", s"doc ${r.doc_id} fell back to the stub: ${r.format}")
      assert(r.width == (4 + r.doc_id % 13).toInt && r.height == (4 + (r.doc_id * 7) % 11).toInt)
      assert(r.n_bytes > 0)
    }
  }

  test("real codec: resize round-trips through the pixel kernel to target dims") {
    val ids = df("doc_id BIGINT", Row(Long.box(3L)), Row(Long.box(8L)))
    val m = Multimodal.synthesizeImages(ids, "doc_id")
    val resized = Multimodal.resize(m, 6, 5).toDF()
      .select(col("doc_id"), lit("image/png").as("media_type"),
        col("content").as("content"))
    val meta = Multimodal.decodeMeta(resized).collect().sortBy(_.doc_id)
    assert(meta.map(r => (r.width, r.height, r.format)).toSeq ==
      Seq((6, 5, "png"), (6, 5, "png")))
    // nearest-neighbor on a gray ramp: top-left target pixel maps to source
    // (0,0) whose gray is id % 256 — check through a full decode
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      resized.filter(col("doc_id") === 3L).select("content").head.getAs[Array[Byte]](0)))
    assert((img.getRGB(0, 0) & 0xff) == 3)
  }

  test("real codec: features are the luminance histogram of the raster") {
    val ids = df("doc_id BIGINT", Row(Long.box(0L)))
    val m = Multimodal.synthesizeImages(ids, "doc_id")
    val f = Multimodal.extractFeatures(m, dims = 16).head().features
    // doc 0: 4x4 raster, gray = (31x + 17y) % 256 — histogram computed here
    val expected = new Array[Float](16)
    for (y <- 0 until 4; x <- 0 until 4) {
      val g = (31 * x + 17 * y) % 256
      val luma = (77 * g + 150 * g + 29 * g) >> 8
      expected(luma * 16 / 256) += 1f
    }
    assert(f.toSeq == expected.toSeq)
    assert(f.sum == 16f, "histogram mass must equal the pixel count")
  }

  test("real codec: synthesized WAVs decode to the rule rate/frames; junk classifies, not crashes") {
    val ids = df("doc_id BIGINT", Row(Long.box(0L)), Row(Long.box(1L)), Row(Long.box(7L)))
    val media = Multimodal.synthesizeWavs(ids, "doc_id")
    // payloads are genuine RIFF containers, not stub bytes
    val head = media.orderBy("doc_id").first().getAs[Array[Byte]]("content")
    assert(new String(head.take(4), "US-ASCII") == "RIFF")
    val got = Multimodal.decodeAudioMeta(media)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got == Map(
      0L -> ((8000, 1, 200L)), 1L -> ((16000, 1, 237L)), 7L -> ((16000, 1, 459L))), s"got $got")
    // an undecodable payload yields the classified row, never an exception
    val junk = df("doc_id BIGINT, media_type STRING, content BINARY",
      Row(Long.box(9L), "audio/wav", "not audio".getBytes("UTF-8")))
    val bad = Multimodal.decodeAudioMeta(junk).first()
    assert((bad.getInt(1), bad.getInt(2), bad.getLong(3)) == ((-1, -1, -1L)))
  }

  test("metadata projection prunes the blob column from the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString + "/media"
    media.write.parquet(dir)
    val scan = spark.read.parquet(dir).select("doc_id", "media_type")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("content"),
      s"blob column not pruned:\n$plan")
  }
}
