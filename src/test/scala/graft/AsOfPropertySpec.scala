package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

/** Property test for the temporal joins (J3): on random dimension
  * interval sets — overlapping, point-sized, gapped, multi-version —
  * and random probes (the day grid makes boundary hits frequent),
  * [[AsOf.join]] and [[AsOf.pointInTime]] must equal a driver-side
  * brute-force nested loop over the same rows, including the left-join
  * null row when nothing matches. This pins the operator to the
  * BETWEEN-inclusive / half-open contracts independently of how
  * Catalyst plans the range residual. */
class AsOfPropertySpec extends AnyFunSuite with SparkSpecBase {

  private case class DimRow(key: Int, sk: String, lo: Int, hi: Int)
  private case class Probe(key: Int, day: Int)

  private val dimGen: Gen[List[DimRow]] = for {
    n <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(1, 3)
      lo <- Gen.choose(1, 28)
      span <- Gen.choose(0, 10)
    } yield (key, lo, math.min(28, lo + span)))
  } yield rows.zipWithIndex.map { case ((k, lo, hi), i) => DimRow(k, s"sk$i", lo, hi) }

  private val probesGen: Gen[List[Probe]] = for {
    n <- Gen.choose(1, 16)
    ps <- Gen.listOfN(n, for {
      key <- Gen.choose(1, 4) // key 4 never has dim rows → left-null path
      day <- Gen.choose(1, 28)
    } yield Probe(key, day))
  } yield ps

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def dayTs(d: Int) = ts(f"2024-01-$d%02d 00:00:00")

  private def dimDf(rows: List[DimRow]) =
    df("k INT, sk STRING, effective_date TIMESTAMP, expiry_date TIMESTAMP",
      rows.map(r => Row(Int.box(r.key), r.sk, dayTs(r.lo), dayTs(r.hi))): _*)

  private def factDf(ps: List[Probe]) =
    df("fk INT, ts TIMESTAMP, pid INT",
      ps.zipWithIndex.map { case (p, i) =>
        Row(Int.box(p.key), dayTs(p.day), Int.box(i)) }: _*)

  /** Brute-force left temporal join: matched (pid, sk) pairs, or
    * (pid, null) when no dim version covers the probe. */
  private def reference(dim: List[DimRow], ps: List[Probe],
      covers: (DimRow, Probe) => Boolean): Seq[(Int, String)] =
    ps.zipWithIndex.flatMap { case (p, i) =>
      val hits = dim.filter(r => r.key == p.key && covers(r, p))
      if (hits.isEmpty) Seq(i -> null) else hits.map(r => i -> r.sk)
    }.sortBy(t => (t._1, Option(t._2).getOrElse("")))

  private def run(out: org.apache.spark.sql.DataFrame): Seq[(Int, String)] =
    out.select(col("__fact.pid"), col("__dim.sk")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq.sortBy(t => (t._1, Option(t._2).getOrElse("")))

  test("inclusive join equals the brute-force BETWEEN reference") {
    (1 to 20).foreach { trial =>
      val dim = sample(dimGen, 7000L + trial)
      val ps = sample(probesGen, 8000L + trial)
      val got = run(AsOf.join(factDf(ps), dimDf(dim), "fk", "k", col("__fact.ts")))
      val want = reference(dim, ps, (r, p) => r.lo <= p.day && p.day <= r.hi)
      assert(got == want, s"trial $trial: dim=$dim probes=$ps")
    }
  }

  test("pointInTime equals the brute-force half-open reference") {
    (1 to 20).foreach { trial =>
      val dim = sample(dimGen, 9000L + trial)
      val ps = sample(probesGen, 10000L + trial)
      val got = run(AsOf.pointInTime(factDf(ps), dimDf(dim), "fk", "k", col("__fact.ts")))
      val want = reference(dim, ps, (r, p) => r.lo <= p.day && p.day < r.hi)
      assert(got == want, s"trial $trial: dim=$dim probes=$ps")
    }
  }
}
