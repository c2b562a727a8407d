package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SqlFunctions._
import graft.scd.{Scd2, Scd2Config}

/** Property-based SCD2 invariants (SURVEY §5.2) over random event streams
  * (ScalaCheck generators, fixed seeds for reproducibility):
  *  - per key exactly one is_active='Y';
  *  - intervals chain contiguously from 1900-01-01 to 3001-01-01;
  *  - version_no is dense 1..n per key;
  *  - any batch split of the stream merges to the one-batch result
  *    (the replay-collapse argument, C2).
  */
class Scd2PropertySpec extends AnyFunSuite with SparkSpecBase {

  private val cfg = Scd2Config(Seq("id"), "ts", payload = Seq("attr"), tiebreak = Seq("seq"))

  // random event streams: few keys, few attr values (forces no-op runs),
  // strictly increasing seq for determinism at equal timestamps
  private val eventsGen: Gen[List[(Int, Int, String)]] = for {
    n <- Gen.choose(1, 24)
    evs <- Gen.listOfN(n, for {
      key <- Gen.choose(1, 4)
      day <- Gen.choose(1, 28)
      attr <- Gen.oneOf("a", "b", "c")
    } yield (key, day, attr))
  } yield evs

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def toDf(evs: List[(Int, Int, String)]) =
    df("id INT, ts TIMESTAMP, attr STRING, seq INT",
      evs.zipWithIndex.map { case ((k, day, a), i) =>
        Row(Int.box(k), ts(f"2024-01-$day%02d 00:00:00"), a, Int.box(i))
      }: _*).withColumn("row_hash", rowHash(col("attr")))

  test("invariants: one active per key, dense versions, contiguous intervals") {
    (1 to 15).foreach { trial =>
      val evs = sample(eventsGen, 1000L + trial)
      val dim = Scd2.fromHistory(toDf(evs), cfg)
        .select("id", "version_no", "is_active", "effective_date", "expiry_date")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
          r.getTimestamp(3), r.getTimestamp(4)))
      dim.groupBy(_._1).foreach { case (key, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == (1 to rows.length),
          s"trial $trial key $key versions not dense: $sorted")
        assert(rows.count(_._3 == "Y") == 1, s"trial $trial key $key active count")
        assert(sorted.head._4 == ts("1900-01-01 00:00:00"), s"trial $trial key $key first eff")
        assert(sorted.last._5 == ts("3001-01-01 00:00:00"), s"trial $trial key $key last exp")
        sorted.sliding(2).foreach {
          case Array(prev, next) =>
            assert(prev._5 == next._4, s"trial $trial key $key gap at v${next._2}")
          case _ => ()
        }
      }
    }
  }

  test("late-arrival collapse: arrival-order splits (out-of-order event times) converge") {
    (1 to 10).foreach { trial =>
      val evs = sample(eventsGen, 4000L + trial)
      val p = sample(Gen.choose(0, evs.length), 5000L + trial)
      val (b1, b2raw) = evs.splitAt(p)
      // a key's first-ever event pins effective_date=1900 and loses its
      // event time (documented), so keep only late events that do not
      // precede the key's first batch-1 event; cross-key lateness and
      // within-key out-of-order (vs later versions) remain fully exercised
      val firstTs = b1.groupBy(_._1).map { case (k, es) => k -> es.map(_._2).min }
      val b2 = b2raw.filter { case (k, day, _) => firstTs.get(k).forall(day >= _) }
      val all = toDf(b1 ++ b2)
      val dim1 = Scd2.fromHistory(toDf(b1), cfg)
      // seq in toDf is list position, so b1 ++ b2 keeps arrival order and
      // the delta is exactly the rows with seq >= |b1|
      val merged = Scd2.merge(dim1, all.filter(col("seq") >= b1.length), cfg)
      assert(canon(merged) == canon(Scd2.fromHistory(all, cfg)),
        s"trial $trial diverged at arrival split $p")
    }
  }

  test("replay collapse: random streams, random cut points, merge == one batch") {
    (1 to 10).foreach { trial =>
      val evs = sample(eventsGen, 2000L + trial)
      val cutDay = sample(Gen.choose(1, 28), 3000L + trial)
      val all = toDf(evs)
      val cut = lit(f"2024-01-$cutDay%02d 00:00:00").cast("timestamp")
      val expected = canon(Scd2.fromHistory(all, cfg))
      val dim1 = Scd2.fromHistory(all.filter(col("ts") < cut), cfg)
      val merged = Scd2.merge(dim1, all.filter(col("ts") >= cut), cfg)
      assert(canon(merged) == expected, s"trial $trial diverged at cut day $cutDay")
    }
  }

  // ------------------------------------------------- delete-aware properties

  private val cfgOp = cfg.copy(opCol = Some("op"))

  /** Event streams where ~20% of events are CDC deletes. */
  private val opEventsGen: Gen[List[(Int, Int, String, String)]] = for {
    n <- Gen.choose(1, 24)
    evs <- Gen.listOfN(n, for {
      key <- Gen.choose(1, 4)
      day <- Gen.choose(1, 28)
      attr <- Gen.oneOf("a", "b", "c")
      op <- Gen.frequency(4 -> Gen.const("I"), 1 -> Gen.const("D"))
    } yield (key, day, attr, op))
  } yield evs

  private def toOpDf(evs: List[(Int, Int, String, String)]) =
    df("id INT, ts TIMESTAMP, attr STRING, seq INT, op STRING",
      evs.zipWithIndex.map { case ((k, day, a, o), i) =>
        Row(Int.box(k), ts(f"2024-01-$day%02d 00:00:00"), a, Int.box(i), o)
      }: _*).withColumn("row_hash", rowHash(col("attr")))

  test("delete invariants: one open version per key, flagged Y or D; mid-chain deletes closed") {
    (1 to 12).foreach { trial =>
      val dim = Scd2.fromHistory(toOpDf(sample(opEventsGen, 6000L + trial)), cfgOp)
        .select("id", "is_active", "expiry_date").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2)))
      dim.groupBy(_._1).foreach { case (key, rows) =>
        val open = rows.filter(_._3 == ts("3001-01-01 00:00:00"))
        assert(open.length == 1, s"trial $trial key $key open-version count")
        assert(rows.count(_._2 == "Y") <= 1, s"trial $trial key $key multiple Y")
        // 'Y' only ever marks the open version; closed versions are N or D
        rows.filter(_._2 == "Y").foreach(r =>
          assert(r._3 == ts("3001-01-01 00:00:00"), s"trial $trial key $key closed Y"))
      }
    }
  }

  test("replay collapse with deletes: merge == one batch across random ts cuts") {
    (1 to 10).foreach { trial =>
      val evs = sample(opEventsGen, 7000L + trial)
      val cutDay = sample(Gen.choose(1, 28), 8000L + trial)
      val all = toOpDf(evs)
      val cut = lit(f"2024-01-$cutDay%02d 00:00:00").cast("timestamp")
      val expected = canon(Scd2.fromHistory(all, cfgOp))
      val dim1 = Scd2.fromHistory(all.filter(col("ts") < cut), cfgOp)
      val merged = Scd2.merge(dim1, all.filter(col("ts") >= cut), cfgOp)
      assert(canon(merged) == expected, s"trial $trial diverged at cut day $cutDay")
    }
  }

  // ------------------------------------------------- snapshot merge (q37)

  test("snapshot replay collapse: snapshotMerge == one-batch snapshot across ts cuts") {
    (1 to 10).foreach { trial =>
      val evs = sample(eventsGen, 9000L + trial)
      val cutDay = sample(Gen.choose(1, 28), 9500L + trial)
      val all = toDf(evs)
      val cut = lit(f"2024-01-$cutDay%02d 00:00:00").cast("timestamp")
      val expected = canon(Scd2.snapshot(all, cfg))
      val snap1 = Scd2.snapshot(all.filter(col("ts") < cut), cfg)
      val merged = Scd2.snapshotMerge(snap1, all.filter(col("ts") >= cut), cfg)
      assert(canon(merged) == expected, s"trial $trial diverged at cut day $cutDay")
    }
  }

  test("snapshot merge converges for per-key-monotone arrival splits") {
    (1 to 10).foreach { trial =>
      val evs = sample(eventsGen, 9800L + trial)
      val p = sample(Gen.choose(0, evs.length), 9900L + trial)
      val (b1, b2raw) = evs.splitAt(p)
      // no-op suppression is lossy: a suppressed same-hash version leaves no
      // trace in the persisted snapshot, so a late event interleaving BEFORE
      // the suppressed point cannot reproduce the one-batch chain (documented
      // snapshotMerge caveat — dbt snapshots behave identically). Keep the
      // delta per-key monotone (the HWM steady state); cross-key lateness
      // remains exercised
      val lastTs = b1.groupBy(_._1).map { case (k, es) => k -> es.map(_._2).max }
      val b2 = b2raw.filter { case (k, day, _) => lastTs.get(k).forall(day >= _) }
      val all = toDf(b1 ++ b2)
      val snap1 = Scd2.snapshot(toDf(b1), cfg)
      val merged = Scd2.snapshotMerge(snap1, all.filter(col("seq") >= b1.length), cfg)
      assert(canon(merged) == canon(Scd2.snapshot(all, cfg)),
        s"trial $trial diverged at arrival split $p")
    }
  }
}
