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

  test("metadata projection prunes the blob column from the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString + "/media"
    media.write.parquet(dir)
    val scan = spark.read.parquet(dir).select("doc_id", "media_type")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("content"),
      s"blob column not pruned:\n$plan")
  }
}
