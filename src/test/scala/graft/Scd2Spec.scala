package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SqlFunctions._
import graft.scd.{Scd2, Scd2Config}

/** The §2.5 SCD2 window algorithm: versioning, interval chaining, no-op
  * suppression, delete handling, and the batch-boundary convergence property
  * (any split of the event stream merges to the same dimension). */
class Scd2Spec extends AnyFunSuite with SparkSpecBase {

  private val cfg = Scd2Config(
    businessKey = Seq("id"), effectiveCol = "ts",
    payload = Seq("attr"), tiebreak = Seq("seq"))

  private def events(rows: (Int, String, String, Int)*): DataFrame =
    df("id INT, ts TIMESTAMP, attr STRING, seq INT",
      rows.map { case (id, t, a, q) => Row(Int.box(id), ts(t), a, Int.box(q)) }: _*)
      .withColumn("row_hash", rowHash(col("attr")))

  private val base = events(
    (1, "2024-01-01 00:00:00", "a", 1),
    (1, "2024-01-02 00:00:00", "a", 2), // same hash → no-op, suppressed
    (1, "2024-01-03 00:00:00", "b", 3),
    (2, "2024-01-05 00:00:00", "x", 4))

  test("fromHistory: version chain, interval chain, activity flags") {
    val dim = Scd2.fromHistory(base, cfg)
      .select("id", "attr", "version_no", "is_active", "effective_date", "expiry_date")
    val rows = dim.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
      r.getString(3), r.getTimestamp(4).toString, r.getTimestamp(5).toString)).toSet
    assert(rows == Set(
      (1, "a", 1, "N", "1900-01-01 00:00:00.0", "2024-01-03 00:00:00.0"),
      (1, "b", 2, "Y", "2024-01-03 00:00:00.0", "3001-01-01 00:00:00.0"),
      (2, "x", 1, "Y", "1900-01-01 00:00:00.0", "3001-01-01 00:00:00.0")))
  }

  test("fromHistory: exactly one active version per live key; versions dense") {
    val dim = Scd2.fromHistory(base, cfg)
    val perKey = dim.groupBy("id").agg(
      sum(when(col("is_active") === "Y", 1).otherwise(0)).as("actives"),
      count(lit(1)).as("n"), max("version_no").as("maxv")).collect()
    perKey.foreach { r =>
      assert(r.getLong(1) == 1L, s"key ${r.getInt(0)} active count")
      assert(r.getLong(2) == r.getInt(3).toLong, s"key ${r.getInt(0)} dense versions")
    }
  }

  test("delete op yields is_active='D'") {
    val ev = events((3, "2024-01-01 00:00:00", "v", 1))
      .withColumn("op", lit("I"))
      .unionByName(events((3, "2024-02-01 00:00:00", "v2", 2))
        .withColumn("op", lit("D")))
    val dim = Scd2.fromHistory(ev, cfg.copy(opCol = Some("op")))
    val act = dim.filter(col("version_no") === 2).select("is_active").head.getString(0)
    assert(act == "D")
  }

  test("surrogate key = md5(key - epochMicros(final effective_date))") {
    val dim = Scd2.fromHistory(base, cfg).filter(col("id") === 2)
    val sk = dim.select("sk").head.getString(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(s"2-$EpochMicros".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sk == expected) // first version's eff is forced to 1900 → epoch micros
  }

  test("merge on empty existing equals fromHistory") {
    val empty = Scd2.fromHistory(base.limit(0), cfg)
    assert(canon(Scd2.merge(empty, base, cfg)) == canon(Scd2.fromHistory(base, cfg)))
  }

  test("batch-boundary convergence: every split point merges to the batch result") {
    val expected = canon(Scd2.fromHistory(base, cfg))
    val cuts = Seq("2024-01-02 00:00:00", "2024-01-03 00:00:00", "2024-01-04 00:00:00")
    cuts.foreach { cut =>
      val dim1 = Scd2.fromHistory(base.filter(col("ts") < lit(cut).cast("timestamp")), cfg)
      val merged = Scd2.merge(dim1, base.filter(col("ts") >= lit(cut).cast("timestamp")), cfg)
      assert(canon(merged) == expected, s"split at $cut diverged")
    }
  }

  test("late out-of-order delta converges to fromHistory (interleave + no-op cases)") {
    val history = events((5, "2024-01-01 00:00:00", "x", 1), (5, "2024-01-10 00:00:00", "y", 2))
    val dim1 = Scd2.fromHistory(history, cfg)
    // late event BETWEEN existing versions, same hash as the later one:
    // the later existing version becomes a no-op re-observation and must go
    val lateSame = events((5, "2024-01-05 00:00:00", "y", 3))
    val mergedSame = Scd2.merge(dim1, lateSame, cfg)
    assert(canon(mergedSame) == canon(Scd2.fromHistory(history.unionByName(lateSame), cfg)))
    assert(mergedSame.count() == 2) // v1 x, v2 y@01-05 — not three versions
    // late event with a NEW hash interleaves as a middle version
    val lateNew = events((5, "2024-01-05 00:00:00", "w", 3))
    val mergedNew = Scd2.merge(dim1, lateNew, cfg)
    assert(canon(mergedNew) == canon(Scd2.fromHistory(history.unionByName(lateNew), cfg)))
    assert(mergedNew.count() == 3)
  }

  test("merge is idempotent: replaying an already-applied delta changes nothing") {
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    val dim1 = Scd2.fromHistory(base.filter(col("ts") < cut), cfg)
    val delta = base.filter(col("ts") >= cut)
    val once = Scd2.merge(dim1, delta, cfg)
    val twice = Scd2.merge(once, delta, cfg)
    assert(canon(twice) == canon(once))
  }

  test("untouched keys never enter the merge plan's rewrite set") {
    val dim1 = Scd2.fromHistory(base, cfg)
    val delta = events((1, "2024-03-01 00:00:00", "c", 9))
    val changed = Scd2.mergeDelta(dim1, delta, cfg)
    assert(changed.filter(col("id") === 2).isEmpty) // key 2 untouched
    val merged = Scd2.merge(dim1, delta, cfg)
    assert(merged.filter(col("id") === 1).count() == 3) // a, b, c versions
    assert(merged.filter(col("id") === 1 && col("is_active") === "Y")
      .select("attr").head.getString(0) == "c")
  }

  test("hot-key guard: a 10^6-row single-key delta refuses loudly, naming the key") {
    // the pathological feed: one dummy member (id=0) carrying a million
    // events — partitionBy(businessKey) would serialize it into ONE task
    val hot = spark.range(0, 1000000)
      .selectExpr("0 AS id", "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts",
        "cast(id as string) AS attr", "cast(id as int) AS seq")
      .withColumn("row_hash", rowHash(col("attr")))
    val guarded = cfg.copy(maxKeyRows = Some(100000L))
    val e = intercept[IllegalArgumentException](Scd2.fromHistory(hot, guarded))
    assert(e.getMessage.contains("hot-key guard"), e.getMessage)
    assert(e.getMessage.contains("id=0"), e.getMessage)
    assert(e.getMessage.contains("maxKeyRows=100000"), e.getMessage)
    // same guard on the merge and snapshot paths
    val existing = Scd2.fromHistory(base, cfg)
    intercept[IllegalArgumentException](Scd2.merge(existing, hot, guarded))
    intercept[IllegalArgumentException](Scd2.snapshot(hot, guarded))
    // a balanced delta under the same threshold passes untouched, and
    // the guarded result is byte-identical to the unguarded one
    assert(canon(Scd2.fromHistory(base, guarded)) == canon(existing))
    // the probe is a histogram anyone can ask for directly
    val top = Scd2.skewTopKeys(hot, cfg, topN = 1)
    assert(top == Seq((Seq("0"), 1000000L)), top.toString)
  }
}
