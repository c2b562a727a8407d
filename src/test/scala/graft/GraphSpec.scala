package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** PageRank power iteration: mass conservation, symmetry, hub dominance,
  * dangling redistribution. */
class GraphSpec extends AnyFunSuite with SparkSpecBase {

  private def edges(rows: (Long, Long)*) =
    df("src BIGINT, dst BIGINT",
      rows.map { case (s, d) => Row(Long.box(s), Long.box(d)) }: _*)

  private def ranks(rows: (Long, Long)*): Map[Long, Double] = {
    val out = Graph.pageRank(edges(rows: _*), "src", "dst", iterations = 5)
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.unpersist(): Unit
    m
  }

  test("basketPairs drops hot baskets whole before pairing; boundary basket kept") {
    import spark.implicits._
    // basket 1: 3 items → 3 pairs; basket 2 is HOT (100 items > cap 64):
    // dropped whole, zero edges; basket 3 re-supports (10,11) → w=2
    val rows = (Seq((1L, 10L), (1L, 11L), (1L, 12L)) ++
      (0 until 100).map(i => (2L, 1000L + i)) ++
      Seq((3L, 10L), (3L, 11L))).toDF("basket", "item")
    val p = Graph.basketPairs(rows, "basket", "item", maxBasketItems = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(p === Seq((10L, 11L, 2L), (10L, 12L, 1L), (11L, 12L, 1L)),
      "hot basket must contribute no pairs; small baskets pair normally")
    // boundary: exactly cap-sized basket is kept — and duplicate
    // (basket, item) rows collapse BEFORE the size test, so a 64-distinct
    // basket listed twice is still a 64-item basket
    val dup = (0 until 64).flatMap(i => Seq((9L, i.toLong), (9L, i.toLong)))
      .toDF("basket", "item")
    assert(Graph.basketPairs(dup, "basket", "item", maxBasketItems = 64)
      .count() === 64L * 63 / 2)
    // basketEdges: both directions, hot basket still dropped whole
    val e = Graph.basketEdges(rows, "basket", "item", maxBasketItems = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(e.length === 3 * 2 + 1 * 2, s"expected both-direction edges, got $e")
    assert(e.toSet === Set((10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L),
      (11L, 12L), (12L, 11L), (10L, 11L), (11L, 10L)))
  }

  test("symmetric triangle: all nodes equal, mass sums to 1") {
    val m = ranks(0L -> 1L, 1L -> 0L, 1L -> 2L, 2L -> 1L, 2L -> 0L, 0L -> 2L)
    assert(m.size == 3)
    assert(m.values.toSet.size == 1, s"expected equal ranks, got $m")
    assert(math.abs(m.values.sum - 1.0) < 1e-4, s"mass not conserved: $m")
  }

  test("bidirectional star: hub outranks leaves, leaves equal") {
    val m = ranks(
      0L -> 1L, 1L -> 0L, 0L -> 2L, 2L -> 0L, 0L -> 3L, 3L -> 0L)
    assert(m(0L) > m(1L), s"hub must dominate: $m")
    assert(m(1L) == m(2L) && m(2L) == m(3L), s"leaves must tie: $m")
    assert(math.abs(m.values.sum - 1.0) < 1e-4, s"mass not conserved: $m")
  }

  test("dangling sink keeps total mass at 1 and outranks its source") {
    // 0 -> 1 only: node 1 is dangling; its mass redistributes uniformly
    val m = ranks(0L -> 1L)
    assert(m.size == 2)
    assert(math.abs(m.values.sum - 1.0) < 1e-4, s"dangling mass lost: $m")
    assert(m(1L) > m(0L), s"sink collects the source's mass: $m")
  }

  test("rank is deterministic across runs") {
    val e = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 2L, 2L -> 1L)
    assert(ranks(e: _*) == ranks(e: _*))
  }

  test("triangleCounts: K4 has four triangles, three per node; pendant excluded") {
    // complete graph on {0,1,2,3} plus pendant edge 3-9 (9 in no triangle)
    val out = Graph.triangleCounts(edges(
      0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 9L),
      "src", "dst")
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $m")
    out.unpersist(): Unit
  }

  test("triangleCounts: reversed duplicates and self-loops don't inflate counts") {
    val out = Graph.triangleCounts(edges(
      0L -> 1L, 1L -> 0L, 1L -> 2L, 2L -> 1L, 2L -> 0L, 0L -> 0L, 1L -> 1L),
      "src", "dst")
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"got $m")
    out.unpersist(): Unit
  }

  test("triangleCounts: triangle-free graph returns empty") {
    val out = Graph.triangleCounts(edges(0L -> 1L, 1L -> 2L, 2L -> 3L), "src", "dst")
    assert(out.count() == 0)
    out.unpersist(): Unit
  }

  test("triangleCounts matches brute-force enumeration on random graphs") {
    // property-style: 4 seeded Erdős–Rényi graphs on 12 nodes vs an
    // independent O(n³) reference count
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val es = for {
        i <- 0 until 12; j <- (i + 1) until 12
        if rnd.nextDouble() < 0.3
      } yield (i.toLong, j.toLong)
      val adj = es.toSet
      def linked(x: Long, y: Long) = adj((x min y, x max y))
      val expected = (for {
        a <- 0L until 12L; b <- (a + 1) until 12L; c <- (b + 1) until 12L
        if linked(a, b) && linked(a, c) && linked(b, c)
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val out = Graph.triangleCounts(edges(es: _*), "src", "dst")
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed: got $got expected $expected")
      out.unpersist(): Unit
    }
  }

  test("labelPropagation separates two cliques across a bridge") {
    val out = Graph.labelPropagation(edges(
      0L -> 1L, 1L -> 2L, 0L -> 2L,          // clique A
      10L -> 11L, 11L -> 12L, 10L -> 12L,    // clique B
      2L -> 10L),                            // bridge
      "src", "dst", rounds = 3)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 1L, 2L).map(m).size == 1, s"clique A split: $m")
    assert(Set(10L, 11L, 12L).map(m).size == 1, s"clique B split: $m")
    assert(m(0L) != m(10L), s"cliques merged: $m")
    out.unpersist(): Unit
  }

  test("labelPropagation is deterministic (fixed rounds, min-label ties)") {
    val es = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 0L, 0L -> 2L)
    def run() = {
      val out = Graph.labelPropagation(edges(es: _*), "src", "dst", rounds = 3)
      val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      out.unpersist(): Unit
      m
    }
    assert(run() == run())
  }

  test("guards reject bad parameters and empty graphs") {
    intercept[IllegalArgumentException](
      Graph.pageRank(edges(0L -> 1L), "src", "dst", iterations = 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(edges(0L -> 1L), "src", "dst", damping = 1.0))
    intercept[IllegalArgumentException](
      Graph.pageRank(edges(), "src", "dst"))
  }
}
