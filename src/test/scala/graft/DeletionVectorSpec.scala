package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.DeletionVector

/** The deletion-vector sidecar codec ([[graft.core.DeletionVector]]):
  * roundtrip, union growth, membership, and the CDC delta. */
class DeletionVectorSpec extends AnyFunSuite {

  test("encode/decode roundtrip — empty, dense, sparse, unsorted input") {
    assert(DeletionVector.decode(DeletionVector.encode(Array.empty[Long])).isEmpty)
    val dense = (0L until 1000L).toArray
    assert(DeletionVector.decode(DeletionVector.encode(dense)).toSeq == dense.toSeq)
    val sparse = Array(0L, 7L, 1L << 40, (1L << 40) + 1, 999999999999L)
    assert(DeletionVector.decode(DeletionVector.encode(sparse)).toSeq == sparse.sorted.toSeq)
    // unsorted + duplicated input canonicalizes
    assert(DeletionVector.decode(DeletionVector.encode(Array(5L, 1L, 5L, 3L))).toSeq ==
      Seq(1L, 3L, 5L))
  }

  test("dense vectors compress far below 8 bytes/position") {
    val bytes = DeletionVector.encode((0L until 100000L).toArray)
    assert(bytes.length < 100000 / 10,
      s"100k consecutive positions took ${bytes.length} bytes")
  }

  test("union merges sorted inputs, dedups, and only grows") {
    val a = Array(1L, 3L, 5L)
    val b = Array(2L, 3L, 6L)
    assert(DeletionVector.union(a, b).toSeq == Seq(1L, 2L, 3L, 5L, 6L))
    assert(DeletionVector.union(a, Array.empty[Long]).toSeq == a.toSeq)
    assert(DeletionVector.union(Array.empty[Long], b).toSeq == b.toSeq)
  }

  test("contains is exact membership") {
    val v = Array(0L, 2L, 9L, 1000L)
    assert(DeletionVector.contains(v, 0L) && DeletionVector.contains(v, 1000L))
    assert(!DeletionVector.contains(v, 1L) && !DeletionVector.contains(v, 999L))
    assert(!DeletionVector.contains(Array.empty[Long], 0L))
  }

  test("minus yields exactly one commit's deletions") {
    val prior = Array(1L, 4L)
    val next = Array(1L, 2L, 4L, 7L)
    assert(DeletionVector.minus(next, prior).toSeq == Seq(2L, 7L))
    assert(DeletionVector.minus(next, Array.empty[Long]).toSeq == next.toSeq)
  }

  test("randomized roundtrip + union model check") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val a = Array.fill(rnd.nextInt(500))(rnd.nextLong(1000000L).abs)
      val b = Array.fill(rnd.nextInt(500))(rnd.nextLong(1000000L).abs)
      val ca = a.distinct.sorted
      val cb = b.distinct.sorted
      assert(DeletionVector.decode(DeletionVector.encode(a)).toSeq == ca.toSeq)
      assert(DeletionVector.union(ca, cb).toSeq == (ca ++ cb).distinct.sorted.toSeq)
    }
  }

  test("sidecar write/load through the executor cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv").toFile
    val f = new java.io.File(dir, "dv-test.dv")
    val positions = Array(3L, 1L, 4L, 1L, 5L)
    val bytes = DeletionVector.write(f, positions)
    assert(bytes == f.length())
    assert(DeletionVector.load(f.getAbsolutePath).toSeq == Seq(1L, 3L, 4L, 5L))
    // second load hits the cache (same array instance)
    assert(DeletionVector.load(f.getAbsolutePath) eq
      DeletionVector.load(f.getAbsolutePath))
  }

  test("bad magic refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      DeletionVector.decode("not a dv at all".getBytes)
    }
    assert(e.getMessage.contains("magic"))
  }

  test("cache eviction is weighted by retained positions, not entry count") {
    val dir = java.nio.file.Files.createTempDirectory("dv_cache").toFile
    // three wide vectors that together exceed the position budget: after
    // loading all three, the cache must have evicted down to the budget
    // (the most-recent stays resident even if alone it fits)
    val wide = (DeletionVector.MaxCachedPositions / 2 + 1024).toInt
    val files = (0 until 3).map { i =>
      val f = new java.io.File(dir, s"wide$i.dv")
      DeletionVector.write(f, Array.tabulate(wide)(j => j.toLong * 2))
      f
    }
    files.foreach(f => DeletionVector.load(f.getAbsolutePath))
    assert(DeletionVector.cachedPositionCount <= DeletionVector.MaxCachedPositions,
      s"cache holds ${DeletionVector.cachedPositionCount} positions, " +
        s"budget is ${DeletionVector.MaxCachedPositions}")
    // the last-loaded vector is still resident (same instance on re-load)
    assert(DeletionVector.load(files.last.getAbsolutePath) eq
      DeletionVector.load(files.last.getAbsolutePath))
    // evicted entries re-load correctly (just a fresh decode)
    assert(DeletionVector.load(files.head.getAbsolutePath).length == wide)
  }
}
