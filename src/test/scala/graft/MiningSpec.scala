package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mining

/** Association rules: hand-checked support/confidence/lift on a tiny
  * basket fixture, set semantics, the oversized-basket drop guard, and
  * the min-support floor. */
class MiningSpec extends AnyFunSuite with SparkSpecBase {

  private def baskets(rows: (String, String)*) =
    df("b STRING, i STRING", rows.map { case (b, i) => Row(b, i) }: _*)

  // 4 baskets: {milk,bread}, {milk,bread,butter}, {milk}, {bread}
  private val fixture = baskets(
    "b1" -> "milk", "b1" -> "bread",
    "b2" -> "milk", "b2" -> "bread", "b2" -> "butter",
    "b3" -> "milk",
    "b4" -> "bread")

  test("hand-checked metrics on the classic milk/bread fixture") {
    val out = Mining.associationRules(fixture, "b", "i", minSupportCount = 2)
      .collect().map(r => (r.getString(1), r.getString(0)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    // milk&bread co-occur in b1,b2: n_ab=2, n_milk=3, n_bread=3, n=4
    // support=0.5, conf(milk->bread)=2/3, lift=2*4/(3*3)=8/9
    val (nAb, nAnt, nCon, sup, conf, lift) = out(("bread", "milk"))
    assert((nAb, nAnt, nCon) == ((2L, 3L, 3L)))
    assert(sup == 0.5 && conf == 0.666667 && lift == 0.888889)
    // butter pairs appear in only one basket -> filtered by minSupportCount=2
    assert(!out.keys.exists { case (a, c) => a == "butter" || c == "butter" })
    // both directions emitted, same n_ab
    assert(out(("milk", "bread"))._1 == 2L)
    assert(out.size == 2)
  }

  test("duplicate (basket, item) rows collapse before counting") {
    val dup = fixture.unionAll(baskets("b1" -> "milk", "b2" -> "bread"))
    val a = Mining.associationRules(dup, "b", "i").collect().toSet
    val b = Mining.associationRules(fixture, "b", "i").collect().toSet
    assert(a == b)
  }

  test("oversized baskets drop whole and shrink the basket universe") {
    val spam = baskets((1 to 5).map(i => "spam" -> s"item_$i"): _*)
    val out = Mining.associationRules(fixture.unionAll(spam), "b", "i",
      minSupportCount = 2, maxBasketItems = 3)
    // spam basket (5 items > 3) vanishes: result identical to fixture alone
    val base = Mining.associationRules(fixture, "b", "i", minSupportCount = 2)
    assert(out.collect().toSet == base.collect().toSet)
  }

  test("random baskets equal a driver-side brute-force reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen: Gen[List[(String, String)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        b <- Gen.choose(1, 8); i <- Gen.choose(1, 6)
      } yield (s"b$b", s"i$i"))
    } yield rows
    (1 to 12).foreach { trial =>
      val rows = gen.pureApply(Gen.Parameters.default, Seed(4000L + trial))
      val sets = rows.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
      val n = sets.size
      val items = sets.values.flatten.toSet.toList
      val want = (for {
        a <- items; c <- items if a != c
        nab = sets.values.count(s => s(a) && s(c)) if nab >= 2
        na = sets.values.count(_(a)); nc = sets.values.count(_(c))
      } yield (a, c, nab.toLong, na.toLong, nc.toLong,
        BigDecimal(nab.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(nab.toDouble / na).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(nab.toDouble * n / (na.toDouble * nc.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      val got = Mining.associationRules(baskets(rows: _*), "b", "i", minSupportCount = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("minSupportCount=1 surfaces the butter singleton pairs") {
    val out = Mining.associationRules(fixture, "b", "i", minSupportCount = 1)
    val pairs = out.collect().map(r => (r.getString(1), r.getString(0))).toSet
    assert(pairs.contains(("butter", "milk")) && pairs.contains(("milk", "butter")))
    assert(out.collect().length == 6) // 3 undirected pairs x 2 directions
  }
}
