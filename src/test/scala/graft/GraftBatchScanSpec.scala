package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.core.GraftTable
import graft.catalog.GraftCatalog

/** The REAL DSv2 Batch read path ([[graft.sources.GraftBatch]]) behind
  * catalog-named tables, in a STOCK session (no extensions): manifest-
  * planned vectorized splits, per-file deletion-vector liveness,
  * rename-map indirections, schema-evolution null fill, split planning
  * under a small `maxPartitionBytes` — the cases the retired V1
  * fallback used to absorb with a whole-relation row boundary. */
class GraftBatchScanSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft_batchscan").toString

  spark.conf.set("spark.sql.catalog.gbat", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gbat.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gbat.ns")

  private def planStr(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("MOR snapshot through a named read: live rows only, still a v2 BatchScan") {
    val path = s"$warehouse/ns/mor"
    GraftTable.writeClustered(spark.range(0, 4000)
      .selectExpr("cast(id as int) AS k", "cast(id % 7 as int) AS g"),
      path, col("k"), numFiles = 8, statsCols = Seq("k"))
    GraftTable.deleteWhereMor(spark, path, col("k") % 10 === 3)
    val named = spark.table("gbat.ns.mor")
    val p = planStr(named)
    assert(p.contains("BatchScan") && !p.contains("RowDataSourceScan"), p)
    assert(named.count() == 3600)
    assert(named.agg(sum("k")).head().getLong(0) ==
      (0L until 4000L).filterNot(_ % 10 == 3).sum)
    // filter + DV compose: pruned files AND dead rows both drop
    val sliced = spark.table("gbat.ns.mor").filter(col("k") < 1000)
    assert(sliced.count() == 900)
    assert(canon(sliced.filter(col("k") < 20).select("k")) ==
      canon((0 until 20).filterNot(_ % 10 == 3).toDF("k")))
  }

  test("dv'd snapshots stay COLUMNAR: the mask applies inside the batch") {
    val path = s"$warehouse/ns/colcheck"
    GraftTable.overwrite(spark.range(0, 1000)
      .selectExpr("cast(id as int) AS k", "id AS x", "cast(id as string) AS s"), path)
    val clean = planStr(spark.table("gbat.ns.colcheck"))
    assert(clean.contains("ColumnarToRow"), s"clean scan should be columnar:\n$clean")
    GraftTable.deleteWhereMor(spark, path, col("k") === 1)
    // one dv'd file must NOT drop the scan to per-row hand-off: the dead
    // positions filter inside the ColumnarBatch (selection-vector wrap)
    val dirty = planStr(spark.table("gbat.ns.colcheck"))
    assert(dirty.contains("ColumnarToRow"), s"dv'd scan should stay columnar:\n$dirty")
    assert(!dirty.contains("RowDataSourceScan"), dirty)
    val t = spark.table("gbat.ns.colcheck")
    assert(t.count() == 999)
    assert(t.filter(col("k") === 1).count() == 0)
    // values survive the selection indirection across types
    assert(t.agg(sum("x")).head().getLong(0) == (0L until 1000L).sum - 1L)
    assert(canon(t.filter(col("k") < 4).select("k", "s")) ==
      canon(Seq((0, "0"), (2, "2"), (3, "3")).toDF("k", "s")))
  }

  test("columnar dv mask: dense vectors, whole-dead batches, nulls, dv'd aggregates") {
    val path = s"$warehouse/ns/coldense"
    // one file, > one vectorized batch (default 4096 rows/batch); kill a
    // whole batch-aligned span plus a scattered comb so both the
    // all-dead-batch skip and the selection-vector path execute
    GraftTable.overwrite(spark.range(0, 20000)
      .selectExpr("id AS k",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE cast(id as string) END AS s")
      .coalesce(1), path)
    GraftTable.deleteWhereMor(spark, path,
      (col("k") >= 4096 && col("k") < 8192) || col("k") % 7 === 0)
    val expect = (0L until 20000L).filterNot(k => (k >= 4096 && k < 8192) || k % 7 == 0)
    val t = spark.table("gbat.ns.coldense")
    val p = planStr(t)
    assert(p.contains("ColumnarToRow"), s"dense-dv scan should stay columnar:\n$p")
    assert(t.count() == expect.size)
    assert(t.agg(sum("k")).head().getLong(0) == expect.sum)
    // null bitmap rides the indirection: count(s) skips the masked nulls
    assert(t.agg(count(col("s"))).head().getLong(0) == expect.count(_ % 5 != 0))
    assert(canon(t.filter(col("k").between(4090, 4100)).select("k")) ==
      canon(expect.filter(k => k >= 4090 && k <= 4100).toDF("k")))
  }

  test("rename indirection: old physical names serve the new logical column") {
    val path = s"$warehouse/ns/ren"
    GraftTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    GraftTable.renameColumn(path, "v", "label")
    // new-layout file alongside the renamed ones
    GraftTable.append(Seq((3, "c")).toDF("k", "label"), path)
    val named = spark.table("gbat.ns.ren")
    assert(named.columns.toSeq == Seq("k", "label"))
    assert(canon(named) == canon(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "label")))
    // filters on the renamed column translate to the physical name for
    // old files and still prune/evaluate correctly everywhere
    assert(canon(named.filter(col("label") === "a")) ==
      canon(Seq((1, "a")).toDF("k", "label")))
    val p = planStr(named)
    assert(p.contains("BatchScan") && !p.contains("RowDataSourceScan"), p)
  }

  test("schema evolution: pre-add files null-fill through the guaranteed-absent name") {
    val path = s"$warehouse/ns/evo"
    GraftTable.overwrite(Seq((1, "a")).toDF("k", "v"), path)
    GraftTable.addColumn(path, "n", "INT")
    GraftTable.append(Seq((2, "b", 20)).toDF("k", "v", "n"), path)
    val named = spark.table("gbat.ns.evo")
    assert(canon(named) == canon(Seq((1, "a", null.asInstanceOf[Integer]),
      (2, "b", Integer.valueOf(20))).toDF("k", "v", "n")))
    // count(n) exercises nullable-count through real scan (stock session)
    assert(named.agg(count(col("n"))).head().getLong(0) == 1L)
  }

  test("rename + deletion vector on the same snapshot") {
    val path = s"$warehouse/ns/renmor"
    GraftTable.overwrite(Seq.tabulate(100)(i => (i, s"w$i")).toDF("k", "v"), path)
    GraftTable.renameColumn(path, "v", "w")
    GraftTable.deleteWhereMor(spark, path, col("k") < 10)
    val named = spark.table("gbat.ns.renmor")
    assert(named.count() == 90)
    assert(canon(named.filter(col("k") < 12)) ==
      canon(Seq((10, "w10"), (11, "w11")).toDF("k", "w")))
  }

  test("split planning: a dv'd file read as multiple splits keeps positions exact") {
    val path = s"$warehouse/ns/split"
    // one larger file so a small maxPartitionBytes forces multiple splits
    GraftTable.overwrite(spark.range(0, 200000)
      .selectExpr("id AS k", "cast(id % 97 as int) AS g").coalesce(1), path)
    GraftTable.deleteWhereMor(spark, path, col("k") % 1000 === 7)
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val named = spark.table("gbat.ns.split")
      named.collect()
      val scans = named.queryExecution.executedPlan.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      val nParts = scans.flatMap(_.inputRDD.partitions).length
      assert(nParts > 1, s"expected multiple splits, got $nParts")
      assert(named.count() == 200000 - 200)
      assert(named.agg(sum("k")).head().getLong(0) ==
        (0L until 200000L).filterNot(_ % 1000 == 7).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("VERSION AS OF pins the snapshot: pre-delete version still sees dead rows") {
    val path = s"$warehouse/ns/tt"
    GraftTable.overwrite(spark.range(0, 500).selectExpr("cast(id as int) AS k"), path)
    val v0 = GraftTable.currentVersion(path).get
    GraftTable.deleteWhereMor(spark, path, col("k") >= 400)
    assert(spark.sql(s"SELECT count(*) FROM gbat.ns.tt VERSION AS OF $v0")
      .head().getLong(0) == 500L)
    assert(spark.table("gbat.ns.tt").count() == 400L)
  }

  test("native DPP: a selective dim filter runtime-prunes fact files through the blooms") {
    val path = s"$warehouse/ns/dpp"
    // hash layout: static stats prune NOTHING; per-file blooms on k
    GraftTable.overwrite(spark.range(0, 8192).selectExpr("id AS k", "id % 97 AS m")
      .repartition(16, col("k")), path, bloomCols = Seq("k"))
    GraftTable.overwrite(spark.range(0, 3)
      .selectExpr("id * 1000 + 7 AS k", "id AS d"), s"$warehouse/ns/dppdim")
    val j = spark.table("gbat.ns.dpp")
      .join(spark.table("gbat.ns.dppdim").filter(col("d") < 2), "k")
    assert(j.count() == 2)
    val planStr = j.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      "expected a runtime filter on the fact scan: " + planStr.take(2000))
    // the runtime IN-set reached the manifest blooms: the fact scan
    // emitted only the surviving files' rows, a fraction of the table
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      case o => o.children.flatMap(find)
    }
    val factScan = find(j.queryExecution.executedPlan)
      .filter(_.runtimeFilters.nonEmpty)
    assert(factScan.nonEmpty, "no scan carried the runtime filter")
    val emitted = factScan.map(_.metrics("numOutputRows").value).sum
    assert(emitted < 8192 / 2,
      s"bloom runtime prune should skip most of 16 files, scan emitted $emitted rows")
  }

  test("the _graft_file/_graft_pos metadata columns SELECT explicitly, hide from *") {
    val path = s"$warehouse/ns/meta"
    GraftTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    val t = spark.table("gbat.ns.meta")
    assert(t.columns.toSeq == Seq("k", "v")) // hidden from SELECT *
    val withMeta = spark.sql(
      "SELECT k, _graft_file, _graft_pos FROM gbat.ns.meta ORDER BY k")
    val rows = withMeta.collect()
    assert(rows.map(_.getLong(2)).toSeq.forall(_ >= 0))
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    // positions are per-file row indexes: distinct within a file
    val perFile = rows.groupBy(_.getString(1))
    assert(perFile.values.forall(rs => rs.map(_.getLong(2)).distinct.length == rs.length))
    // provenance is real: each file actually holds its claimed rows
    perFile.foreach { case (uri, rs) =>
      val physical = spark.read.parquet(new java.net.URI(uri).getPath)
      assert(rs.length <= physical.count())
    }
  }

  test("metadata columns emit COLUMNAR: constant file vector, row-index pos, dv-composed") {
    val path = s"$warehouse/ns/metacol"
    GraftTable.overwrite(spark.range(0, 5000)
      .selectExpr("cast(id as int) AS k", "id AS x").coalesce(2), path)
    // a metadata projection must stay in whole-stage fusion: _graft_file
    // is a per-batch constant vector, _graft_pos rides the generated
    // row-index vector — no per-row hand-off
    val both = spark.sql(
      "SELECT k, _graft_file, _graft_pos FROM gbat.ns.metacol")
    assert(planStr(both).contains("ColumnarToRow"),
      s"meta projection should be columnar:\n${planStr(both)}")
    assert(both.count() == 5000)
    // file-only (no row index requested), pos-only, and meta-only shapes
    val fileOnly = spark.sql("SELECT k, _graft_file FROM gbat.ns.metacol")
    assert(planStr(fileOnly).contains("ColumnarToRow"))
    assert(fileOnly.select("_graft_file").distinct().count() == 2)
    val posOnly = spark.sql("SELECT _graft_pos FROM gbat.ns.metacol")
    assert(posOnly.collect().map(_.getLong(0)).sorted.take(3).toSeq == Seq(0L, 0L, 1L))
    // DV composes: dead rows drop, positions keep their ORIGINAL indexes
    GraftTable.deleteWhereMor(spark, path, col("k") === 0)
    val dvd = spark.sql("SELECT k, _graft_pos FROM gbat.ns.metacol")
    assert(planStr(dvd).contains("ColumnarToRow"),
      s"dv'd meta projection should stay columnar:\n${planStr(dvd)}")
    val dvdRows = dvd.collect()
    assert(dvdRows.length == 4999)
    assert(!dvdRows.exists(_.getInt(0) == 0))
    // the masked row's position is a hole: its file restarts at pos >= 1
    assert(dvdRows.map(_.getLong(1)).min >= 0)
    // grouping by provenance still answers exactly under the mask
    val byFile = spark.sql(
      "SELECT _graft_file AS f, count(*) AS n FROM gbat.ns.metacol GROUP BY 1")
    assert(byFile.agg(sum("n")).head().getLong(0) == 4999)
  }

  test("zero-column projection: named count(*) scans live rows only") {
    val path = s"$warehouse/ns/cnt"
    GraftTable.overwrite(spark.range(0, 1234).selectExpr("id AS k", "id AS x"), path)
    GraftTable.deleteWhereMor(spark, path, col("k") < 34)
    // stock session: no metadata-aggregate rewrite — this IS the scan path
    assert(spark.sql("SELECT count(*) FROM gbat.ns.cnt").head().getLong(0) == 1200L)
  }
}
