package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SqlFunctions._
import graft.operators.AsOf

/** Temporal join semantics (SURVEY J3): boundary behavior at a version flip,
  * dummy-member fallback, and the late-arriving-dim repair pass. */
class AsOfSpec extends AnyFunSuite with SparkSpecBase {

  // key 1 versions: [1900, flip) and [flip, 3001)
  private val flip = "2024-06-01 00:00:00"
  private def dim = df(
    "k INT, sk STRING, effective_date TIMESTAMP, expiry_date TIMESTAMP",
    Row(Int.box(1), "v1", ts("1900-01-01 00:00:00"), ts(flip)),
    Row(Int.box(1), "v2", ts(flip), ts("3001-01-01 00:00:00")))

  private def fact(probe: String) =
    df("fk INT, ts TIMESTAMP", Row(Int.box(1), ts(probe)))

  test("pointInTime at the flip instant matches exactly the new version") {
    val out = AsOf.pointInTime(fact(flip), dim, "fk", "k", col("__fact.ts"))
    assert(out.select("__dim.sk").collect().map(_.getString(0)).toSeq == Seq("v2"))
  }

  test("inclusive BETWEEN join at the flip matches both versions (reference behavior)") {
    val out = AsOf.join(fact(flip), dim, "fk", "k", col("__fact.ts"))
    assert(out.count() == 2)
  }

  test("probe before any version start finds nothing (left join → null sk)") {
    val d = dim.filter(col("sk") === "v2") // only [flip, 3001)
    val out = AsOf.pointInTime(fact("2024-01-01 00:00:00"), d, "fk", "k", col("__fact.ts"))
    assert(out.select(AsOf.resolveSk(col("__dim.sk")).as("sk")).head.getString(0) ==
      spark.range(1).select(dummySk).head.getString(0))
  }

  test("repairFailedLookups re-resolves only dummy-keyed rows") {
    val dummy = spark.range(1).select(dummySk).head.getString(0)
    val facts = df("fk INT, ts TIMESTAMP, sk STRING",
      Row(Int.box(1), ts("2024-07-01 00:00:00"), dummy), // repairable → v2
      Row(Int.box(1), ts("2024-05-01 00:00:00"), "already"), // untouched
      Row(Int.box(1), ts("2024-03-01 00:00:00"), null), // NULL sk → repaired, not dropped
      Row(Int.box(2), ts("2024-07-01 00:00:00"), dummy)) // still fails → dummy
    val repaired = AsOf.repairFailedLookups(facts, dim, "fk", "k", col("__fact.ts"), "sk")
    val got = repaired.collect().map(r => (r.getInt(0), r.getString(2))).toSet
    assert(got == Set((1, "v2"), (1, "already"), (1, "v1"), (2, dummy)))
  }
}
