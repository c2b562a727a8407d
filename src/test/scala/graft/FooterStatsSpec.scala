package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

import graft.core.GraftTable

/** The footer-stats fast path (`GraftTable.footerStats`): the post-write
  * stats pass folds the parquet footers of the files we just wrote —
  * zero jobs — and must be VALUE-IDENTICAL to the distributed re-read
  * job it replaces, on every type and edge the manifest codec carries.
  * Each fixture writes the same single-partition batch twice (footer
  * path vs seam-forced job path) and compares the manifests'
  * per-column stats byte for byte. Unusable footers (NaN, ±0.0,
  * stats-dropped huge binaries, legacy INT96) must FALL BACK, never
  * diverge. */
class FooterStatsSpec extends AnyFunSuite with SparkSpecBase {

  private val base = Files.createTempDirectory("graft_footer").toString
  private var n = 0

  /** Writes `data` both ways; returns (footer stats, job stats) as
    * column→ColStats maps per file ordinal, plus whether the footer
    * path actually fired on the first write. */
  private def bothWays(data: DataFrame, statsCols: Seq[String])
      : (Seq[Map[String, GraftTable.ColStats]],
         Seq[Map[String, GraftTable.ColStats]], Boolean) = {
    n += 1
    val a = s"$base/a$n"; val b = s"$base/b$n"
    GraftTable.overwrite(data, a, statsCols)
    val footerFired = GraftTable.lastStatsPassUsedFooterForTests
    GraftTable.disableFooterStatsForTests = true
    try GraftTable.overwrite(data, b, statsCols)
    finally GraftTable.disableFooterStatsForTests = false
    def statsOf(p: String) = GraftTable.filesOf(p,
      GraftTable.currentManifest(p).get).sortBy(_.path)
      .map(_.stats.map { case (k, v) => k -> v.copy(bloom = None) })
    (statsOf(a), statsOf(b), footerFired)
  }

  private def assertIdentical(data: DataFrame, statsCols: Seq[String],
      expectFooter: Boolean): Unit = {
    val (f, j, fired) = bothWays(data.coalesce(1), statsCols)
    assert(f == j, s"footer-path stats must equal job-path stats:\n$f\nvs\n$j")
    assert(fired == expectFooter,
      s"expected footer path fired=$expectFooter (was $fired)")
  }

  test("boundedParallel: many-file folds are pool-bounded, not wall-serial") {
    // 32 tasks of ~80ms each: serial is ~2.56s; a 16-wide pool finishes
    // in ~2 rounds. Assert well under half of serial — generous enough
    // for CI scheduling noise, impossible for a serial fold.
    val t0 = System.nanoTime()
    val out = GraftTable.boundedParallel(1 to 32, GraftTable.FooterFoldParallelism) {
      i => Thread.sleep(80); i * 2
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(out == (1 to 32).map(_ * 2), "order must be preserved")
    assert(elapsedMs < 1280, s"fold took ${elapsedMs}ms — looks wall-serial")
  }

  test("boundedParallel: first worker exception rethrows on the caller") {
    val e = intercept[IllegalStateException] {
      GraftTable.boundedParallel(1 to 8, 4) { i =>
        if (i == 3) throw new IllegalStateException("boom") else i
      }
    }
    assert(e.getMessage == "boom")
    // sequential edge: size 1 and parallelism 1 both bypass the pool
    assert(GraftTable.boundedParallel(Seq(7), 16)(_ + 1) == Seq(8))
    assert(GraftTable.boundedParallel(1 to 3, 1)(_ + 1) == Seq(2, 3, 4))
  }

  test("many-file write: footer path fires and matches the job path per file") {
    val a = s"$base/many_a"; val b = s"$base/many_b"
    val data = spark.range(0, 4000).selectExpr("id AS k", "id % 37 AS v")
      .repartition(40) // 40 part files through one staged write
    GraftTable.overwrite(data, a, Seq("k", "v"))
    assert(GraftTable.lastStatsPassUsedFooterForTests,
      "the 40-file batch must take the footer path")
    GraftTable.disableFooterStatsForTests = true
    try GraftTable.overwrite(data, b, Seq("k", "v"))
    finally GraftTable.disableFooterStatsForTests = false
    def statsOf(p: String) = GraftTable.filesOf(p,
      GraftTable.currentManifest(p).get)
      .map(fe => (fe.rows, fe.stats.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> v.copy(bloom = None) }).toString)
      .sorted
    assert(statsOf(a).size == 40 && statsOf(a) == statsOf(b))
  }

  test("integers, longs, extremes, negatives") {
    assertIdentical(df("b TINYINT, s SMALLINT, i INT, l BIGINT",
      Row(1.toByte, (-3).toShort, -2147483648, Long.MinValue),
      Row((-128).toByte, 9.toShort, 2147483647, Long.MaxValue),
      Row(null, null, null, null)),
      Seq("b", "s", "i", "l"), expectFooter = true)
  }

  test("strings: unicode, supplementary plane, empty") {
    assertIdentical(df("s STRING",
      Row(""), Row("z"), Row("𐀀"), // U+10000 — UTF-8 vs UTF-16 order
      Row(""), Row("日本語テキスト"), Row(null)),
      Seq("s"), expectFooter = true)
  }

  test("huge string values: dropped footer stats fall back to the job") {
    val big1 = "a" * 3000 + "x"; val big2 = "b" * 3000 + "y"
    val (f, j, _) = bothWays(
      df("s STRING", Row(big1), Row(big2)).coalesce(1), Seq("s"))
    assert(f == j, "huge-binary stats must agree regardless of path")
  }

  test("timestamps (micros) and dates") {
    assertIdentical(df("t TIMESTAMP, d DATE",
      Row(ts("1969-12-31 23:59:59.999999"), java.sql.Date.valueOf("1969-12-31")),
      Row(ts("2033-05-18 03:33:20.123456"), java.sql.Date.valueOf("2033-05-18")),
      Row(ts("1900-01-01 00:00:00"), java.sql.Date.valueOf("1900-01-01")),
      Row(null, null)),
      Seq("t", "d"), expectFooter = true)
  }

  test("pre-epoch fractional timestamp AS THE FILE BOUND encodes floored, both paths") {
    // encode("ts", Timestamp) used truncating division: -1 ms with
    // 999999000 nanos read back as +999999 µs — one second high — so a
    // file whose max is 1969-12-31 23:59:59.999999 recorded a wrong
    // bound on the job path and pruning could skip matching rows
    val data = df("t TIMESTAMP",
      Row(ts("1969-12-31 23:59:58.5")), Row(ts("1969-12-31 23:59:59.999999")))
    val (f, j, fired) = bothWays(data.coalesce(1), Seq("t"))
    assert(fired && f == j, s"pre-epoch bounds must agree:\n$f\nvs\n$j")
    val st = f.head("t")
    assert(st.min.contains("-1500000") && st.max.contains("-1"),
      s"bounds must be the floored epoch-micros, got $st")
  }

  test("doubles and floats: plain values footer-fold; NaN and ±0.0 fall back") {
    assertIdentical(df("x DOUBLE, y FLOAT",
      Row(-1.5d, 2.25f), Row(1e300, -3.5f), Row(Double.MinPositiveValue, 0.5f)),
      Seq("x", "y"), expectFooter = true)
    // NaN pollutes parquet bounds; Spark's aggregate orders it largest
    assertIdentical(df("x DOUBLE", Row(1.0d), Row(Double.NaN), Row(-2.0d)),
      Seq("x"), expectFooter = false)
    // parquet normalizes zero signs; Spark may keep either — must agree
    val (f0, j0, _) = bothWays(
      df("x DOUBLE", Row(0.0d), Row(-0.0d), Row(5.0d)).coalesce(1), Seq("x"))
    assert(f0 == j0, s"±0.0 bounds must not diverge:\n$f0\nvs\n$j0")
    assertIdentical(
      df("x DOUBLE", Row(Double.PositiveInfinity), Row(Double.NegativeInfinity)),
      Seq("x"), expectFooter = true)
  }

  test("decimals across physical encodings: int32, int64, binary") {
    assertIdentical(df("a DECIMAL(9,2), b DECIMAL(18,4), c DECIMAL(38,10)",
      Row(new java.math.BigDecimal("1234567.89"),
        new java.math.BigDecimal("-12345678901234.5678"),
        new java.math.BigDecimal("1234567890123456789012345678.0123456789")),
      Row(new java.math.BigDecimal("-0.01"),
        new java.math.BigDecimal("0.0001"),
        new java.math.BigDecimal("-9999999999999999999999999999.9999999999")),
      Row(null, null, null)),
      Seq("a", "b", "c"), expectFooter = true)
  }

  test("all-null columns and zero-row part files") {
    assertIdentical(df("k INT, s STRING",
      Row(1, null), Row(2, null)), Seq("k", "s"), expectFooter = true)
    // 1 row over 4 partitions → 3 zero-row part files, like the job path
    val (f, j, fired) = bothWays(
      spark.range(0, 1).selectExpr("cast(id as int) AS k").repartition(4), Seq("k"))
    assert(fired && f == j)
  }

  test("bucketed layout: footer stats + narrow bucket job record the same ids") {
    val data = spark.range(0, 400)
      .selectExpr("cast(id % 40 as int) AS k", "id AS x", "concat('v', id) AS s")
    val a = s"$base/ba"; val b = s"$base/bb"
    GraftTable.writeBucketed(data, a, "k", 4, statsCols = Seq("k", "x", "s"))
    assert(GraftTable.lastStatsPassUsedFooterForTests,
      "bucketed write must still take the footer fast path for column stats")
    GraftTable.disableFooterStatsForTests = true
    try GraftTable.writeBucketed(data, b, "k", 4, statsCols = Seq("k", "x", "s"))
    finally GraftTable.disableFooterStatsForTests = false
    def statsOf(p: String) = GraftTable.filesOf(p,
      GraftTable.currentManifest(p).get).filter(_.rows > 0)
      .map(fe => fe.stats.map { case (k, v) => k -> v.copy(bloom = None) })
      .sortBy(_.get(GraftTable.BucketStatCol).flatMap(_.min).getOrElse(""))
    assert(statsOf(a) == statsOf(b))
    assert(statsOf(a).forall(_.contains(GraftTable.BucketStatCol)))
  }

  test("bloom bitmaps: the one-job OR-aggregator equals the explode+distinct reference") {
    val p = s"$base/bloom"
    val data = spark.range(0, 500)
      .selectExpr("concat('k', id % 111) AS s", "cast(id % 37 as int) AS i",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE id END AS n")
    GraftTable.overwrite(data.coalesce(2), p, bloomCols = Seq("s", "i", "n"))
    val files = GraftTable.filesOf(p, GraftTable.currentManifest(p).get)
      .filter(_.rows > 0)
    assert(files.nonEmpty)
    for (c <- Seq("s", "i", "n"); fe <- files) {
      val bloom = fe.stats(c).bloom.getOrElse(fail(s"no bloom for $c"))
      val Array(kS, mS, _) = bloom.split(":", 3)
      val (k, m) = (kS.toInt, mS.toInt)
      val positions = spark.read.parquet(s"$p/${fe.path}")
        .filter(col(c).isNotNull)
        .select(explode(array((0 until k).map(j =>
          pmod(xxhash64(col(c), lit(j)), lit(m.toLong))): _*)).as("p"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(bloom == GraftTable.packBloom(k, m, positions),
        s"aggregator bitmap for '$c' in ${fe.path} diverges from the reference")
    }
  }

  test("timestamps survive the whole prune/meta-agg pipeline on the footer path") {
    val p = s"$base/pipeline"
    val data = spark.range(0, 1000).selectExpr(
      "timestamp_micros(cast(id * 1000000 as long)) AS ts", "id AS x")
      .repartitionByRange(4, col("ts"))
    GraftTable.overwrite(data, p, statsCols = Seq("ts", "x"))
    assert(GraftTable.lastStatsPassUsedFooterForTests)
    // range pruning on the footer-derived bounds skips files
    val pruned = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("x", Some(0L), Some(100L))))
    assert(pruned.filesRead < 4,
      "footer-derived bounds must still skip files")
    assert(pruned.df.filter(col("x").between(0L, 100L)).count() == 101)
  }
}
