package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.core.GraftTable
import graft.catalog.GraftCatalog

/** PARTIAL limit pushdown on named scans
  * ([[graft.catalog.GraftNamedScanBuilder.pushLimit]]): a bare
  * `LIMIT n` plans only enough files to cover `n` LIVE rows — on a
  * 100k-file snapshot that is one task, not a sweep — while any
  * filtered, bucketed, or otherwise non-trivial shape keeps the full
  * plan (the subset composes with nothing; the Limit node always
  * stays, so over-delivery is safe by construction). */
class GraftLimitPushdownSpec extends AnyFunSuite with SparkSpecBase {

  private val warehouse = Files.createTempDirectory("graft_limpush").toString

  spark.conf.set("spark.sql.catalog.lim", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.lim.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS lim.ns")

  /** Number of distinct FILES the scan planned (splits can byte-pack
    * several small files into one task — count files, not tasks). */
  private def scanFiles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Seq[Int] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.map {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.filePath.toString).distinct.length
          case _ => 1
        }
      case o => o.children.flatMap(find)
    }
    find(df.queryExecution.executedPlan).sum
  }

  test("bare LIMIT plans only enough files to cover n rows") {
    val path = s"$warehouse/ns/many"
    // 8 files of 100 rows each (range-partitioned so files are even)
    GraftTable.overwrite(spark.range(0, 800).repartitionByRange(8, col("id"))
      .selectExpr("id AS k", "id * 2 AS x"), path)
    assert(GraftTable.filesOf(path,
      GraftTable.currentManifest(path).get).count(_.rows > 0) == 8)
    val q = spark.sql("SELECT * FROM lim.ns.many LIMIT 5")
    assert(q.collect().length == 5)
    assert(scanFiles(q) == 1,
      "LIMIT 5 over 8x100-row files must plan exactly one file")
    // a limit spanning files takes just enough
    val q2 = spark.sql("SELECT * FROM lim.ns.many LIMIT 150")
    assert(q2.collect().length == 150)
    assert(scanFiles(q2) == 2)
  }

  test("the file subset is deletion-vector-exact: liveRows, not physical rows") {
    val path = s"$warehouse/ns/mor"
    GraftTable.overwrite(spark.range(0, 200).repartitionByRange(4, col("id"))
      .selectExpr("id AS k"), path)
    // kill 45 of EVERY file's 50 rows (order-independent): 5 live each
    GraftTable.deleteWhereMor(spark, path, col("k") % 50 < 45)
    val q = spark.sql("SELECT * FROM lim.ns.mor LIMIT 12")
    // a subset chosen by PHYSICAL rows would stop at one 50-row file
    // and under-deliver 5 rows — liveRows must drive the cover
    assert(q.collect().length == 12)
    assert(scanFiles(q) == 3,
      "a 12-row limit over 5-live-row files must plan three files")
  }

  test("LIMIT under a WHERE keeps the full plan, results exact") {
    val q = spark.sql("SELECT * FROM lim.ns.many WHERE x % 4 = 2 LIMIT 5")
    val rows = q.collect()
    assert(rows.length == 5 && rows.forall(_.getLong(1) % 4 == 2))
    assert(scanFiles(q) == 8,
      "a filtered limit must not subset files by liveRows")
  }

  test("bucketed snapshots skip the subset (key-grouped contract), results exact") {
    val path = s"$warehouse/ns/buck"
    GraftTable.writeBucketed(spark.range(0, 400)
      .selectExpr("cast(id % 64 as int) AS k", "id AS x"), path, "k", 4)
    val q = spark.sql("SELECT * FROM lim.ns.buck LIMIT 5")
    assert(q.collect().length == 5)
  }
}
