package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Reads the REAL driver testdata (guarded on existence) so a driver-side
  * schema regeneration — like the round-6 events.ts ns-long → µs-NTZ flip —
  * fails `sbt test` loudly instead of silently breaking 28 registry queries.
  */
class TablesSpec extends AnyFunSuite with SparkSpecBase {
  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/events.parquet").exists()

  test("events normalizes real driver parquet to (ts timestamp, ts_us long)") {
    assume(haveData, s"$sfDir not present; skipping real-data check")
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("ts_us").dataType === LongType)
    val n = ev.count()
    assert(n > 0, "events must be non-empty")
    // ts and ts_us must stay mutually consistent under the UTC session
    val bad = ev.filter(unix_micros(col("ts")) =!= col("ts_us")).count()
    assert(bad === 0L, "ts/ts_us drifted apart")
    // values must be in a sane epoch range (catches unit mix-ups: a ns value
    // read as µs lands in year ~56k; a ms value read as µs in 1970)
    val (lo, hi) = ("1990-01-01", "2100-01-01")
    val outOfRange = ev.filter(col("ts") < lit(lo).cast(TimestampType) ||
      col("ts") > lit(hi).cast(TimestampType)).count()
    assert(outOfRange === 0L, "ts out of plausible range — unit mix-up?")
  }

  test("every driver table reads and is non-empty") {
    assume(haveData, s"$sfDir not present; skipping real-data check")
    Tables.All.foreach { name =>
      val n = Tables(spark, sfDir, name).count()
      assert(n > 0, s"$name is empty")
    }
  }
}
