package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cluster

/** Spherical k-means + SemDeDup semantic dedup. */
class ClusterSpec extends AnyFunSuite with SparkSpecBase {

  private def vecs(rows: (Long, Seq[Float])*) =
    df("vec_id BIGINT, embedding ARRAY<FLOAT>",
      rows.map { case (id, v) => Row(Long.box(id), v) }: _*)

  test("kmeansAssign separates two obvious directional groups") {
    // ids 0 (group A) and 1 (group B) seed the two clusters
    val v = vecs(
      0L -> Seq(1f, 0.1f, 0f, 0f), 2L -> Seq(0.9f, 0.2f, 0f, 0f),
      4L -> Seq(1f, 0f, 0.1f, 0f),
      1L -> Seq(0f, 0.1f, 1f, 0.1f), 3L -> Seq(0.1f, 0f, 0.9f, 0f),
      5L -> Seq(0f, 0f, 1f, 0.2f))
    val out = Cluster.kmeansAssign(v, "vec_id", "embedding", k = 2, iters = 3)
    val m = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(0L, 2L, 4L).map(m) == Set(0) && Set(1L, 3L, 5L).map(m) == Set(1), s"got $m")
    out.unpersist(): Unit
  }

  test("kmeansAssign is total and deterministic; ties take the lowest cluster id") {
    // all vectors share one direction: every centroid scores cosine 1.0,
    // so everything lands in cluster 0 and clusters 1-2 stay empty (their
    // centroids carry over) — the assignment must still cover every row
    val v = vecs((0L to 4L).map(i => i -> Seq(1f, 1f, 0f, 0f)): _*)
    val out = Cluster.kmeansAssign(v, "vec_id", "embedding", k = 3, iters = 3)
    val m = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m.size == 5 && m.values.toSet == Set(0), s"got $m")
    out.unpersist(): Unit
    val again = Cluster.kmeansAssign(v, "vec_id", "embedding", k = 3, iters = 3)
    assert(again.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap == m)
    again.unpersist(): Unit
  }

  test("semanticDedup drops near-dups toward the lowest-id representative") {
    val v = vecs(
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(1f, 0.001f, 0f, 0f), // near-dup of 1
      3L -> Seq(0f, 1f, 0f, 0f),     // orthogonal — kept
      4L -> Seq(1f, 0f, 0f, 0f))     // exact dup of 1
    val out = Cluster.semanticDedup(v, "vec_id", "embedding",
      k = 1, iters = 1, tau = 0.99)
    val m = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(m.keySet == Set(2L, 4L), s"got $m")
    assert(m(2L)._1 == 1L && m(4L)._1 == 1L, "rep must be the lowest qualifying id")
    assert(m(4L)._2 == 1.0 && m(2L)._2 >= 0.99)
  }

  test("gramMatrix: hand-computed upper triangle in micro-units") {
    val v = vecs(0L -> Seq(1f, 2f), 1L -> Seq(3f, 4f))
    val out = Cluster.gramMatrix(v, "embedding")
    val m = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // q-vectors (1e6,2e6) and (3e6,4e6)
    assert(m == Map((0, 0) -> 1.0e13, (0, 1) -> 1.4e13, (1, 1) -> 2.0e13), s"got $m")
    out.unpersist(): Unit
  }

  test("quantize makes centroid arithmetic integer-exact") {
    // micro-unit quantization: every component is a whole number of 1e-6
    val v = vecs(0L -> Seq(0.1234567f, -0.000000049f, 1f, 0f))
    val q = v.select(Cluster.quantize(org.apache.spark.sql.functions.col("embedding")))
      .head.getSeq[Double](0)
    assert(q.forall(x => x == math.rint(x)), s"non-integer micro-units: $q")
    assert(q(2) == 1000000.0 && q(3) == 0.0)
  }
}
