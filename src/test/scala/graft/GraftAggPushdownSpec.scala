package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.core.GraftTable
import graft.catalog.GraftCatalog

/** STOCK-SESSION metadata aggregates via DSv2 aggregate pushdown
  * ([[graft.catalog.GraftNamedScanBuilder.supportCompletePushDown]] →
  * [[graft.catalog.GraftLocalAggScan]]): `count(*)` / `count(col)` /
  * `min` / `max` with no GROUP BY and no WHERE must answer from the
  * manifest as a LocalTableScan — zero files read — and every bail
  * condition must fall back to the real scan with identical results.
  * The shared test session has NO GraftExtensions, so these plans prove
  * the v2 path alone. */
class GraftAggPushdownSpec extends AnyFunSuite with SparkSpecBase {

  private val warehouse = Files.createTempDirectory("graft_aggpush").toString

  spark.conf.set("spark.sql.catalog.agp", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.agp.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS agp.ns")

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("count/min/max answer from the manifest as a LocalTableScan") {
    val path = s"$warehouse/ns/t"
    val src = spark.range(0, 1000).selectExpr(
      "cast(id as int) AS k",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('s', lpad(id, 6, '0')) END AS s",
      "timestamp_micros(cast(id * 1000000 as long)) AS ts")
    GraftTable.overwrite(src, path)
    GraftTable.append(spark.range(1000, 1500).selectExpr(
      "cast(id as int) AS k",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('s', lpad(id, 6, '0')) END AS s",
      "timestamp_micros(cast(id * 1000000 as long)) AS ts"), path)
    val q = spark.sql(
      "SELECT count(*) AS c, count(s) AS cs, min(k) AS mk, max(k) AS xk, " +
        "min(s) AS ms, max(ts) AS xt FROM agp.ns.t")
    val p = planOf(q)
    assert(p.contains("LocalTableScan"), s"must plan a local scan:\n$p")
    assert(!p.contains("BatchScan"), s"must not touch a data file:\n$p")
    assert(canon(q) == canon(spark.read.format("graft").load(path).agg(
      count(lit(1)).as("c"), count(col("s")).as("cs"),
      min("k").as("mk"), max("k").as("xk"),
      min("s").as("ms"), max("ts").as("xt"))))
  }

  test("expressions AROUND answered aggregates fold; count on empty table is 0, min NULL") {
    val path = s"$warehouse/ns/empty"
    GraftTable.create(path, org.apache.spark.sql.types.StructType.fromDDL(
      "k INT, s STRING"))
    val q = spark.sql("SELECT count(*) * 2 AS c2, min(k) AS mk FROM agp.ns.empty")
    val p = planOf(q)
    assert(p.contains("LocalTableScan") && !p.contains("BatchScan"))
    val row = q.collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("a WHERE clause bails to the real scan, results exact") {
    val q = spark.sql("SELECT count(*) AS c, max(k) AS xk FROM agp.ns.t WHERE k < 100")
    assert(planOf(q).contains("BatchScan"), "filtered aggregates need real IO")
    val row = q.collect().head
    assert(row.getLong(0) == 100L && row.getInt(1) == 99)
  }

  test("GROUP BY, sum, avg, distinct all bail to the real scan") {
    for (sql <- Seq(
      "SELECT k % 3 AS g, count(*) AS c FROM agp.ns.t GROUP BY k % 3",
      "SELECT sum(k) AS sk FROM agp.ns.t",
      "SELECT count(DISTINCT s) AS ds FROM agp.ns.t")) {
      assert(planOf(spark.sql(sql)).contains("BatchScan"), s"must scan: $sql")
    }
    assert(spark.sql("SELECT sum(k) AS sk FROM agp.ns.t").collect().head.getLong(0) ==
      (0L until 1500L).sum)
  }

  test("deletion vectors: count(*) stays zero-scan (liveRows), min/max bail") {
    val path = s"$warehouse/ns/mor"
    GraftTable.overwrite(spark.range(0, 200)
      .selectExpr("cast(id as int) AS k", "id AS x"), path)
    // a pred that straddles every file: each survivor carries a real DV
    GraftTable.deleteWhereMor(spark, path, col("k") % 7 === 0)
    val m = GraftTable.currentManifest(path).get
    assert(GraftTable.filesOf(path, m).exists(_.dv.isDefined),
      "fixture must leave at least one deletion-vectored file")
    val cq = spark.sql("SELECT count(*) AS c FROM agp.ns.mor")
    val cp = planOf(cq)
    assert(cp.contains("LocalTableScan") && !cp.contains("BatchScan"),
      s"DV-aware liveRows count must stay metadata-only:\n$cp")
    assert(cq.collect().head.getLong(0) == 171L)
    val mq = spark.sql("SELECT min(k) AS mk FROM agp.ns.mor")
    assert(planOf(mq).contains("BatchScan"),
      "the vector may have killed the extremum — min must scan")
    assert(mq.collect().head.getInt(0) == 1)
  }

  test("rename indirection bails; time travel answers from the pinned manifest") {
    val path = s"$warehouse/ns/ren"
    GraftTable.overwrite(spark.range(0, 10)
      .selectExpr("cast(id as int) AS a", "id AS b"), path)
    val v1 = GraftTable.currentVersion(path).get
    GraftTable.append(spark.range(10, 30)
      .selectExpr("cast(id as int) AS a", "id AS b"), path)
    // pinned read answers v1's manifest
    val tt = spark.sql(s"SELECT count(*) AS c FROM agp.ns.ren VERSION AS OF $v1")
    assert(planOf(tt).contains("LocalTableScan"))
    assert(tt.collect().head.getLong(0) == 10L)
    GraftTable.renameColumn(path, "a", "a2")
    val rq = spark.sql("SELECT max(a2) AS xa FROM agp.ns.ren")
    assert(planOf(rq).contains("BatchScan"),
      "stats under a rename indirection can collide with a current logical name")
    assert(rq.collect().head.getInt(0) == 29)
  }
}
