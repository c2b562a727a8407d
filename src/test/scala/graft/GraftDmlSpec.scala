package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftTable
import graft.plans.{GraftDmlRule, GraftSql}

/** SQL text for the write path ([[graft.plans.GraftDml]]): MERGE INTO /
  * DELETE FROM / UPDATE statements over graft.`/path` targets, parsed by
  * Spark's own grammar and routed to the COW operators. */
class GraftDmlSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dml").toString

  private def kv(rows: (Int, String)*) =
    df("k INT, v STRING", rows.map(r => Row(Int.box(r._1), r._2)): _*)

  test("DELETE FROM graft.`path` WHERE pred routes to deleteWhere") {
    val path = tmp() + "/t"
    GraftTable.overwrite(kv(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"), path)
    val v = GraftSql.dml(spark, s"DELETE FROM graft.`$path` WHERE k >= 2 AND v <> 'd'")
    assert(v == 2L)
    assert(canon(GraftTable.read(spark, path)) == canon(kv(1 -> "a", 4 -> "d")))
    // alias-qualified predicate
    GraftSql.dml(spark, s"DELETE FROM graft.`$path` AS t WHERE t.k = 4")
    assert(canon(GraftTable.read(spark, path)) == canon(kv(1 -> "a")))
  }

  test("UPDATE graft.`path` SET assignments read the row's own columns") {
    val path = tmp() + "/t"
    GraftTable.overwrite(df("k INT, v STRING, n DOUBLE",
      Row(Int.box(1), "a", Double.box(10.0)),
      Row(Int.box(2), "b", Double.box(20.0))), path)
    GraftSql.dml(spark,
      s"UPDATE graft.`$path` SET v = concat(v, '!'), n = n * 2 WHERE k = 2")
    assert(canon(GraftTable.read(spark, path)) == canon(df("k INT, v STRING, n DOUBLE",
      Row(Int.box(1), "a", Double.box(10.0)),
      Row(Int.box(2), "b!", Double.box(40.0)))))
    // a typo'd SET column refuses (the mergeInto/updateWhere contract)
    intercept[Exception] {
      GraftSql.dml(spark, s"UPDATE graft.`$path` SET vv = 'x' WHERE k = 1")
    }
  }

  test("MERGE INTO with update/delete/insert clauses matches the Scala API") {
    val root = tmp()
    val (p1, p2) = (s"$root/sql", s"$root/api")
    val base = df("k INT, status STRING, amt DOUBLE",
      (0 until 20).map(i => Row(Int.box(i), if (i % 3 == 0) "F" else "O",
        Double.box(i * 10.0))): _*)
    val updates = df("k INT, status STRING, amt DOUBLE",
      (10 until 30).map(i => Row(Int.box(i), if (i % 2 == 0) "F" else "P",
        Double.box(i * 100.0))): _*)
    GraftTable.overwrite(base, p1)
    GraftTable.overwrite(base, p2)
    updates.createOrReplaceTempView("dml_updates")
    GraftSql.dml(spark, s"""
      MERGE INTO graft.`$p1` AS t USING dml_updates AS s
      ON t.k = s.k
      WHEN MATCHED AND s.status = 'P' THEN DELETE
      WHEN MATCHED AND s.status = 'F' THEN UPDATE SET amt = s.amt, status = s.status
      WHEN NOT MATCHED THEN INSERT *""")
    GraftTable.mergeInto(spark, p2, updates, Seq("k"),
      updateSet = Map("amt" -> GraftTable.srcCol("amt"),
        "status" -> GraftTable.srcCol("status")),
      updateWhen = Some(GraftTable.srcCol("status") === "F"),
      deleteWhen = Some(GraftTable.srcCol("status") === "P"))
    assert(canon(GraftTable.read(spark, p1)) == canon(GraftTable.read(spark, p2)))
  }

  test("MERGE refusals are loud: non-equi ON, BY SOURCE, conditional insert") {
    val path = tmp() + "/t"
    GraftTable.overwrite(kv(1 -> "a"), path)
    kv(2 -> "b").createOrReplaceTempView("dml_src")
    def bad(sql: String): Unit = { intercept[Exception](GraftSql.dml(spark, sql)): Unit }
    bad(s"MERGE INTO graft.`$path` t USING dml_src s ON t.k > s.k " +
      "WHEN MATCHED THEN DELETE")
    bad(s"MERGE INTO graft.`$path` t USING dml_src s ON t.k = s.k " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    bad(s"MERGE INTO graft.`$path` t USING dml_src s ON t.k = s.k " +
      "WHEN NOT MATCHED AND s.k > 0 THEN INSERT *")
    // nothing committed by any refusal
    assert(GraftTable.currentVersion(path).contains(1L))
  }

  test("non-DML and non-graft statements refuse at the dml door") {
    intercept[IllegalArgumentException](GraftSql.dml(spark, "SELECT 1"))
    intercept[IllegalArgumentException](
      GraftSql.dml(spark, "DELETE FROM some_table WHERE x = 1"))
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT routes to addCheck/dropCheck") {
    val path = tmp() + "/t"
    GraftTable.overwrite(kv(1 -> "a", 2 -> "b"), path)
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` ADD CONSTRAINT pos_k CHECK (k > 0)")
    assert(GraftTable.currentManifest(path).get.checks.get.contains("pos_k"))
    // the constraint actually gates writes
    intercept[IllegalArgumentException](GraftTable.append(kv(-1 -> "x"), path))
    // adding a violated constraint refuses (addCheck's whole-table scan)
    intercept[Exception] {
      GraftSql.dml(spark, s"ALTER TABLE graft.`$path` ADD CONSTRAINT big CHECK (k > 100)")
    }
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` DROP CONSTRAINT pos_k")
    assert(!GraftTable.currentManifest(path).get.checks.exists(_.contains("pos_k")))
    GraftTable.append(kv(-1 -> "x"), path) // gate lifted
    // DROP CONSTRAINT IF EXISTS on a missing name is a no-op; without
    // IF EXISTS it refuses
    val v = GraftTable.currentVersion(path)
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` DROP CONSTRAINT IF EXISTS nope")
    assert(GraftTable.currentVersion(path) == v)
    intercept[Exception](
      GraftSql.dml(spark, s"ALTER TABLE graft.`$path` DROP CONSTRAINT nope"))
  }

  test("VACUUM and OPTIMIZE statements route to vacuum/compactFiles") {
    val path = tmp() + "/t"
    (1 to 5).foreach(i => if (i == 1) GraftTable.overwrite(kv(i -> s"v$i"), path)
      else GraftTable.append(kv(i -> s"v$i"), path))
    // OPTIMIZE bin-packs the 5 small files as a new commit (v6)
    GraftSql.dml(spark, s"OPTIMIZE graft.`$path`")
    assert(GraftTable.currentVersion(path).contains(6L))
    assert(GraftTable.read(spark, path).count() == 5)
    // VACUUM with a generous retention age deletes nothing
    assert(GraftSql.dml(spark, s"VACUUM graft.`$path` RETAIN 1000000 HOURS") == 0L)
    assert(GraftTable.versions(path).map(_._1) == (1L to 6L))
    // plain VACUUM reclaims to the keepVersions floor; v5 still references
    // the pre-compaction files so no DATA file dies yet
    GraftSql.dml(spark, s"VACUUM graft.`$path`")
    assert(GraftTable.versions(path).map(_._1) == Seq(5L, 6L))
    // one more commit pushes v5 out — its small files become unreferenced
    GraftTable.append(kv(6 -> "v6"), path)
    // DRY RUN reports what a real vacuum would reclaim, touching nothing
    val wouldDelete = GraftSql.dml(spark, s"VACUUM graft.`$path` DRY RUN")
    assert(wouldDelete > 0L)
    assert(GraftTable.versions(path).map(_._1) == Seq(5L, 6L, 7L),
      "dry run must not drop manifests")
    assert(GraftSql.dml(spark, s"VACUUM graft.`$path`") == wouldDelete)
    assert(GraftTable.versions(path).map(_._1) == Seq(6L, 7L))
    assert(GraftTable.read(spark, path).count() == 6)
    // OPTIMIZE ZORDER BY on one column reclusters; ranges then skip
    val p2 = tmp() + "/t2"
    GraftTable.overwrite(df("k INT, v STRING",
      (0 until 64).map(i => Row(Int.box(i), s"v$i")): _*).repartition(8), p2,
      statsCols = Seq("k"))
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p2` ZORDER BY (k)")
    val scan = GraftTable.readPruned(spark, p2,
      Seq(GraftTable.ColRange("k", Some(1), Some(2))))
    assert(scan.filesRead <= 1 && scan.df.count() >= 2)
    // multi-column ZORDER on a string dimension refuses (no numeric
    // quantization preserves lexical locality)
    val e = intercept[Exception](
      GraftSql.dml(spark, s"OPTIMIZE graft.`$p2` ZORDER BY (k, v)"))
    assert(e.getMessage.contains("quantization"))
    // and the parser wrapper serves the same statements for spark.sql
    val wrapped = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    assert(wrapped.parsePlan(s"VACUUM graft.`$p2`")
      .getClass.getSimpleName == "GraftVacuumCommand")
    assert(wrapped.parsePlan(s"OPTIMIZE graft.`$p2`")
      .getClass.getSimpleName == "GraftOptimizeCommand")
    assert(wrapped.parsePlan(s"ALTER TABLE graft.`$p2` ADD CONSTRAINT c CHECK (k >= 0)")
      .getClass.getSimpleName == "GraftAddCheckCommand")
  }

  test("OPTIMIZE ZORDER BY (x, y) interleaves with auto-quantized bounds") {
    // a 64×64 grid shuffled across 8 files: before the relayout every
    // file spans the full range of BOTH dimensions, so nothing prunes
    val p = tmp() + "/grid"
    val rnd = new scala.util.Random(7)
    val cells = rnd.shuffle((for { x <- 0 until 64; y <- 0 until 64 }
      yield Row(Int.box(x), Int.box(y), s"p$x-$y")).toList)
    // stats on x ONLY: y's bounds must come off the measured fallback
    // scan while x's come off the manifest — both paths in one relayout
    GraftTable.overwrite(df("x INT, y INT, payload STRING", cells: _*).repartition(8),
      p, statsCols = Seq("x"))
    val before = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("x", Some(0), Some(7))))
    assert(before.filesRead == before.filesTotal, "unclustered layout must not prune")
    // the SQL statement routes, relayouts, and forces stats onto x AND y
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p` ZORDER BY (x, y)")
    assert(canon(GraftTable.read(spark, p)) ==
      canon(df("x INT, y INT, payload STRING", cells: _*)))
    // the tiny table packed into one file — relayout again at a file
    // count that makes locality observable, via the same expression
    GraftTable.writeClustered(GraftTable.read(spark, p), p,
      GraftTable.zorderClusterExpr(spark, p, Seq("x", "y")), numFiles = 16,
      statsCols = Seq("x", "y"))
    val px = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("x", Some(0), Some(7))))
    val py = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("y", Some(0), Some(7))))
    assert(px.filesTotal == 16 && py.filesTotal == 16)
    // a 1/8 slice of EITHER dimension skips at least half the files —
    // the both-dimensions-at-once property a single-column sort lacks
    assert(px.filesRead <= 8, s"x-slice read ${px.filesRead}/16")
    assert(py.filesRead <= 8, s"y-slice read ${py.filesRead}/16")
    // candidate files hold every matching row (callers apply the exact
    // predicate on top of the pruned scan)
    assert(px.df.filter(col("x") <= 7).count() == 8 * 64)
    assert(py.df.filter(col("y") <= 7).count() == 8 * 64)
    // NULL dimensions quantize to the low corner instead of NULLing the
    // key: a relayout over nullable data keeps every row
    val pn = tmp() + "/nulls"
    GraftTable.overwrite(df("x INT, y INT",
      Row(Int.box(1), null), Row(null, Int.box(2)), Row(Int.box(3), Int.box(4))), pn)
    GraftSql.dml(spark, s"OPTIMIZE graft.`$pn` ZORDER BY (x, y)")
    assert(GraftTable.read(spark, pn).count() == 3)
    // date dimensions quantize on the epoch-day codec
    val pd = tmp() + "/dates"
    GraftTable.overwrite(df("d DATE, n INT",
      Row(java.sql.Date.valueOf("2024-01-01"), Int.box(1)),
      Row(java.sql.Date.valueOf("2024-06-30"), Int.box(2))), pd)
    GraftSql.dml(spark, s"OPTIMIZE graft.`$pd` ZORDER BY (d, n)")
    assert(GraftTable.read(spark, pd).count() == 2)
  }

  test("TRUNCATE TABLE empties in one metadata-only commit; history survives") {
    val path = tmp() + "/t"
    GraftTable.overwrite(kv(1 -> "a", 2 -> "b", 3 -> "c"), path)
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` ADD CONSTRAINT pos CHECK (k >= 0)")
    GraftTable.setProperties(path, Map("graft.owner" -> "dml-spec"))
    val dataBefore = Option(new java.io.File(path, "data").listFiles).get
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val v = GraftSql.dml(spark, s"TRUNCATE TABLE graft.`$path`")
    val m = GraftTable.currentManifest(path).get
    assert(m.op == "truncate" && m.version == v && m.files.isEmpty)
    // empty but typed; schema, checks, and properties carried
    val emptied = GraftTable.read(spark, path)
    assert(emptied.count() == 0 && emptied.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(m.checks.exists(_.contains("pos")))
    assert(m.properties.exists(_.get("graft.owner").contains("dml-spec")))
    // metadata-only: not one data file touched; old snapshot time-travels
    val dataAfter = Option(new java.io.File(path, "data").listFiles).get
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    assert(dataAfter == dataBefore)
    assert(GraftTable.readVersion(spark, path, v - 1).count() == 3)
    // writes continue; the carried CHECK still gates them
    GraftSql.dml(spark, s"INSERT INTO graft.`$path` SELECT 7, 'g'")
    assert(canon(GraftTable.read(spark, path)) == canon(kv(7 -> "g")))
    intercept[Exception](
      GraftSql.dml(spark, s"INSERT INTO graft.`$path` SELECT -1, 'bad'"))
    // vacuum after truncate reclaims the whole old payload
    GraftTable.vacuum(path, keepVersions = 2)
    val left = Option(new java.io.File(path, "data").listFiles).get
      .filter(_.getName.endsWith(".parquet"))
    assert(left.length == 1, s"expected only the post-truncate file, got ${left.length}")
  }

  test("graft.clusterBy property drives plain OPTIMIZE (liquid-clustering UX)") {
    val path = tmp() + "/t"
    // appends land as they arrive — interleaved, zero write-time sort
    GraftTable.overwrite(df("k INT, v STRING",
      (0 until 64).map(i => Row(Int.box(i * 7 % 64), s"v$i")): _*), path)
    (1 to 3).foreach { b =>
      GraftTable.append(df("k INT, v STRING",
        (0 until 64).map(i => Row(Int.box((i * 11 + b) % 64), s"b$b-$i")): _*), path)
    }
    GraftTable.setProperties(path, Map("graft.clusterBy" -> "k"))
    GraftSql.dml(spark, s"OPTIMIZE graft.`$path`")
    // the relayout range-clusters on k: per-file [min,max] windows are
    // disjoint, so a point probe prunes to one file
    val entries = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .filter(_.rows > 0)
    val ranges = entries.map(fe =>
      (fe.stats("k").min.get.toInt, fe.stats("k").max.get.toInt)).sortBy(_._1)
    if (ranges.size > 1)
      ranges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping cluster ranges: $ranges")
      }
    assert(GraftTable.read(spark, path).count() == 256)
    // an explicit ZORDER BY still overrides per statement
    GraftSql.dml(spark, s"OPTIMIZE graft.`$path` ZORDER BY (k)")
    assert(GraftTable.read(spark, path).count() == 256)
  }

  test("graft.targetFileSize property tunes what OPTIMIZE considers small") {
    val path = tmp() + "/t"
    GraftTable.overwrite(df("k INT, v STRING",
      (0 until 32).map(i => Row(Int.box(i), s"v$i")): _*).repartition(8), path)
    val before = GraftTable.filesOf(path, GraftTable.currentManifest(path).get).size
    assert(before == 8)
    // target=1 byte: no file is small — OPTIMIZE is a no-op
    GraftTable.setProperties(path, Map("graft.targetFileSize" -> "1"))
    GraftSql.dml(spark, s"OPTIMIZE graft.`$path`")
    assert(GraftTable.filesOf(path, GraftTable.currentManifest(path).get).size == before)
    // default-sized target: everything packs into one file
    GraftTable.unsetProperties(path, Seq("graft.targetFileSize"))
    GraftSql.dml(spark, s"OPTIMIZE graft.`$path`")
    assert(GraftTable.filesOf(path, GraftTable.currentManifest(path).get).size == 1)
    // a non-positive target refuses loudly
    GraftTable.setProperties(path, Map("graft.targetFileSize" -> "0"))
    intercept[IllegalArgumentException](GraftSql.dml(spark, s"OPTIMIZE graft.`$path`"))
  }

  test("INSERT INTO/OVERWRITE and CREATE TABLE AS SELECT route to append/overwrite") {
    val root = tmp()
    val p = s"$root/t"
    // CTAS creates v1; IF NOT EXISTS no-ops; a bare re-CREATE refuses
    GraftSql.dml(spark,
      s"CREATE TABLE graft.`$p` AS SELECT id AS k, concat('v', id) AS v FROM range(3)")
    assert(GraftTable.read(spark, p).count() == 3)
    intercept[Exception](
      GraftSql.dml(spark, s"CREATE TABLE graft.`$p` AS SELECT 1 AS x"))
    val v1 = GraftTable.currentVersion(p)
    GraftSql.dml(spark, s"CREATE TABLE IF NOT EXISTS graft.`$p` AS SELECT 1 AS x")
    assert(GraftTable.currentVersion(p) == v1, "IF NOT EXISTS must no-op")
    // INSERT INTO appends positionally, casting to the target types
    GraftSql.dml(spark, s"INSERT INTO graft.`$p` SELECT 10, 'ten'")
    assert(GraftTable.read(spark, p).count() == 4)
    // BY NAME binds by name regardless of SELECT order, resolves
    // case-insensitively, and refuses extra columns (native semantics —
    // a typo'd column must never silently drop)
    GraftSql.dml(spark, s"INSERT INTO graft.`$p` BY NAME SELECT 'eleven' AS V, 11 AS K")
    assert(GraftTable.read(spark, p)
      .filter(col("k") === 11 && col("v") === "eleven").count() == 1)
    val ex = intercept[Exception](GraftSql.dml(spark,
      s"INSERT INTO graft.`$p` BY NAME SELECT 12 AS k, 'x' AS v, 1 AS extraa"))
    assert(ex.getMessage.contains("extraa"))
    // INSERT OVERWRITE replaces the snapshot; history keeps the old one
    GraftSql.dml(spark, s"INSERT OVERWRITE graft.`$p` SELECT id AS k, 'x' AS v FROM range(2)")
    assert(GraftTable.read(spark, p).count() == 2)
    assert(GraftTable.readVersion(spark, p, 3L).count() == 5)
    // CHECK constraints gate SQL inserts like any write
    GraftSql.dml(spark, s"ALTER TABLE graft.`$p` ADD CONSTRAINT pos CHECK (k >= 0)")
    intercept[Exception](GraftSql.dml(spark, s"INSERT INTO graft.`$p` SELECT -1, 'bad'"))
    // arity mismatches and column lists refuse loudly
    intercept[Exception](GraftSql.dml(spark, s"INSERT INTO graft.`$p` SELECT 1"))
    intercept[Exception](GraftSql.dml(spark, s"INSERT INTO graft.`$p` (k) SELECT 1"))
    // OR REPLACE evolves the schema in place; REPLACE of nothing refuses.
    // (The CHECK references k, which the new schema drops — the
    // documented contract is to drop the check first, or the write
    // fails its analysis loudly.)
    intercept[Exception](
      GraftSql.dml(spark, s"CREATE OR REPLACE TABLE graft.`$p` AS SELECT 1.5 AS d"))
    GraftSql.dml(spark, s"ALTER TABLE graft.`$p` DROP CONSTRAINT pos")
    GraftSql.dml(spark, s"CREATE OR REPLACE TABLE graft.`$p` AS SELECT 1.5 AS d")
    assert(GraftTable.read(spark, p).columns.toSeq == Seq("d"))
    intercept[Exception](
      GraftSql.dml(spark, s"REPLACE TABLE graft.`$root/none` AS SELECT 1 AS x"))
    // the parser wrapper serves the same statements; non-graft untouched
    val wrapped = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    assert(wrapped.parsePlan(s"INSERT INTO graft.`$p` SELECT 1.0")
      .getClass.getSimpleName == "GraftInsertCommand")
    assert(wrapped.parsePlan(s"CREATE TABLE graft.`$root/t2` AS SELECT 1 AS x")
      .getClass.getSimpleName == "GraftCreateTableCommand")
    assert(wrapped.parsePlan("INSERT INTO other SELECT 1") ==
      spark.sessionState.sqlParser.parsePlan("INSERT INTO other SELECT 1"))
  }

  test("INSERT INTO ... REPLACE WHERE swaps the predicate region atomically") {
    val path = tmp() + "/t"
    GraftTable.writeClustered(
      df("k INT, v STRING", (0 until 40).map(i => Row(Int.box(i), s"v$i")): _*),
      path, col("k"), 4, statsCols = Seq("k"))
    df("k INT, v STRING", Row(Int.box(12), "R12"), Row(Int.box(17), "R17"))
      .createOrReplaceTempView("rw_src")
    val v = GraftSql.dml(spark,
      s"INSERT INTO graft.`$path` REPLACE WHERE k >= 10 AND k <= 19 SELECT k, v FROM rw_src")
    assert(GraftTable.currentManifest(path).get.op == "replace_where")
    val got = GraftTable.read(spark, path)
    assert(got.count() == 32) // 30 outside the region + 2 replacements
    assert(got.filter(col("k").between(10, 19)).count() == 2)
    assert(got.filter(col("k") === 12).select("v").head.getString(0) == "R12")
    // the region's old file dropped metadata-only (clustered decade = one file)
    val ch = GraftTable.currentManifest(path).get.changes.get
    assert(ch.removed.size == 1 && ch.added.map(_.rows).sum == 2)
    // a replacement row outside the declared region refuses loudly
    df("k INT, v STRING", Row(Int.box(99), "stray")).createOrReplaceTempView("rw_bad")
    val e = intercept[IllegalArgumentException] {
      GraftSql.dml(spark,
        s"INSERT INTO graft.`$path` REPLACE WHERE k <= 19 SELECT k, v FROM rw_bad")
    }
    assert(e.getMessage.contains("NOT matching"))
    assert(GraftTable.currentManifest(path).get.version == v) // nothing committed
    // plain INSERT INTO (no REPLACE WHERE) still routes as an append
    GraftSql.dml(spark, s"INSERT INTO graft.`$path` SELECT k, v FROM rw_bad")
    assert(GraftTable.read(spark, path).count() == 33)
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN route to the metadata-only schema ops") {
    val path = tmp() + "/t"
    GraftTable.overwrite(kv(1 -> "a", 2 -> "b"), path)
    // ADD COLUMNS: appended nullable columns, NULL from pre-add files
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` ADD COLUMNS (n INT, note STRING)")
    val added = GraftTable.read(spark, path)
    assert(added.columns.toSeq == Seq("k", "v", "n", "note"))
    assert(added.filter(col("n").isNull && col("note").isNull).count() == 2)
    // RENAME COLUMN: logical name moves, data intact
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` RENAME COLUMN v TO label")
    assert(canon(GraftTable.read(spark, path).select("k", "label")) ==
      canon(kv(1 -> "a", 2 -> "b").toDF("k", "label")))
    // DROP COLUMN: gone from the head, still in history
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` DROP COLUMN note")
    assert(GraftTable.read(spark, path).columns.toSeq == Seq("k", "label", "n"))
    assert(GraftTable.readVersion(spark, path, 3L).columns.contains("note"))
    // IF EXISTS on a missing column is a no-op; without it, loud
    val v = GraftTable.currentVersion(path)
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` DROP COLUMN IF EXISTS nope")
    assert(GraftTable.currentVersion(path) == v)
    intercept[Exception](
      GraftSql.dml(spark, s"ALTER TABLE graft.`$path` DROP COLUMN nope"))
    // nested adds and defaults refuse loudly (flat schemas, no defaults)
    intercept[Exception](GraftSql.dml(spark,
      s"ALTER TABLE graft.`$path` ADD COLUMNS (s STRUCT<a: INT>, s.b INT)"))
    intercept[Exception](GraftSql.dml(spark,
      s"ALTER TABLE graft.`$path` ADD COLUMNS (d INT DEFAULT 7)"))
    // the parser wrapper serves the same statements for spark.sql
    val wrapped = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    assert(wrapped.parsePlan(s"ALTER TABLE graft.`$path` RENAME COLUMN n TO m")
      .getClass.getSimpleName == "GraftRenameColumnCommand")
    assert(wrapped.parsePlan(s"ALTER TABLE graft.`$path` ADD COLUMNS (x DOUBLE)")
      .getClass.getSimpleName == "GraftAddColumnsCommand")
    assert(wrapped.parsePlan(s"ALTER TABLE graft.`$path` DROP COLUMN n")
      .getClass.getSimpleName == "GraftDropColumnsCommand")
    // non-graft ALTERs pass through untouched
    assert(wrapped.parsePlan("ALTER TABLE other RENAME COLUMN a TO b") ==
      spark.sessionState.sqlParser.parsePlan("ALTER TABLE other RENAME COLUMN a TO b"))
  }

  test("OPTIMIZE WHERE bounds the rewrite to the stats window") {
    val p = tmp() + "/t"
    def dataFiles() = Option(new java.io.File(p, "data").listFiles).get
      .map(f => f.getName -> ((f.lastModified, f.length))).toMap
    // 8 clustered files over x = 0..255, then 4 tiny appends that all
    // land in the low window — the append-disorder OPTIMIZE exists for
    val rows = df("x INT, v STRING",
      (0 until 256).map(i => Row(Int.box(i), s"v$i")): _*)
    GraftTable.writeClustered(rows, p, col("x"), numFiles = 8, statsCols = Seq("x"))
    (0 until 4).foreach(i => GraftTable.append(
      df("x INT, v STRING", Row(Int.box(i), s"a$i")), p, statsCols = Seq("x")))
    // the LIVE set (the data dir keeps replaced files until vacuum)
    def liveFiles() = GraftTable.filesOf(p, GraftTable.currentManifest(p).get)
      .map(fe => fe.path.split('/').last -> ((fe.rows, fe.bytes))).toMap
    val before = liveFiles()
    val physBefore = dataFiles()
    assert(before.size == 12)
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE x BETWEEN 0 AND 31")
    val after = liveFiles()
    // everything provably outside the window carried over byte-untouched
    val carried = after.keySet.intersect(before.keySet)
    assert(carried.size >= 7, s"expected >=7 carried files, got ${carried.size}")
    assert(carried.forall(n => after(n) == before(n) && dataFiles()(n) == physBefore(n)),
      "carried files must be untouched")
    assert(after.size < before.size, "the window must have repacked")
    // the low window now reads as one repacked file; data is intact
    val low = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("x", Some(0), Some(31))))
    assert(low.filesRead <= 2, s"low window reads ${low.filesRead}")
    assert(GraftTable.read(spark, p).count() == 260)
    // a window that is already one right-sized file is a no-op commit
    val v = GraftTable.currentVersion(p)
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE x >= 224")
    assert(GraftTable.currentVersion(p) == v, "single-file window must not commit")
    // WHERE + ZORDER BY reclusters just the window — but only when every
    // cluster column is bounded (carried files span the full range of an
    // unbounded one, which would silently poison the recluster)
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE x <= 31 ZORDER BY (x)")
    assert(GraftTable.read(spark, p).count() == 260)
    val pz = intercept[Exception](
      GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE x <= 31 ZORDER BY (v)"))
    assert(pz.getMessage.contains("not bounded"))
    // a string bound routes through the literal parser
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE v = 'v3'")
    assert(GraftTable.read(spark, p).count() == 260)
    // quote-aware conjunction split: an " and " INSIDE a literal is
    // text, not a boundary — both statements parse and run
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE v BETWEEN 'a and b' AND 'zzz'")
    assert(GraftTable.read(spark, p).count() == 260)
    GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE v >= 'a and b' AND x <= 31")
    assert(GraftTable.read(spark, p).count() == 260)
    // anything richer than bounds refuses loudly
    intercept[Exception](
      GraftSql.dml(spark, s"OPTIMIZE graft.`$p` WHERE x % 2 = 0"))
  }

  test("ANALYZE backfills stats and blooms without rewriting data") {
    val p = tmp() + "/t"
    def dataFiles() = Option(new java.io.File(p, "data").listFiles).get
      .map(f => f.getName -> f.lastModified).sortBy(_._1).toSeq
    // clustered on x but indexed only on k: the layout could skip on x,
    // nothing records the ranges
    val rows = df("k INT, x INT",
      (0 until 256).map(i => Row(Int.box(i), Int.box(i / 2))): _*)
    GraftTable.writeClustered(rows, p, col("x"), numFiles = 8, statsCols = Seq("k"))
    val before = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("x", Some(0), Some(15))))
    assert(before.filesRead == 8, "no stats on x: nothing prunes")
    val snapshot = dataFiles()
    // the SQL statement backfills; data files untouched byte-for-byte
    val v = GraftSql.dml(spark, s"ANALYZE graft.`$p` COMPUTE STATS FOR COLUMNS (x)")
    assert(v == 2L && GraftTable.currentVersion(p).contains(2L))
    assert(dataFiles() == snapshot, "analyze must not rewrite data files")
    val after = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("x", Some(0), Some(15))))
    assert(after.filesRead <= 2, s"backfilled stats must prune, read ${after.filesRead}/8")
    assert(canon(GraftTable.read(spark, p)) == canon(rows))
    // idempotent: nothing left to do → no commit, same version
    assert(GraftTable.analyzeStats(spark, p, Seq("x")) == 2L)
    assert(GraftTable.currentVersion(p).contains(2L))
    // incremental: an append adds an unindexed file; re-analyze covers
    // just that file and pruning holds across old + new
    GraftTable.append(df("k INT, x INT", Row(Int.box(999), Int.box(500))), p,
      statsCols = Seq("k"))
    assert(GraftSql.dml(spark, s"ANALYZE graft.`$p` COMPUTE STATS FOR COLUMNS (x)") == 4L)
    val inc = GraftTable.readPruned(spark, p,
      Seq(GraftTable.ColRange("x", Some(500), Some(500))))
    assert(inc.filesRead == 1 && inc.df.count() == 1)
    // time travel to the pre-analyze snapshot still reads
    assert(GraftTable.readVersion(spark, p, 1L).count() == 256)
    // bloom backfill: hash layout prunes nothing by range, a backfilled
    // bloom proves files clean for a point probe
    val pb = tmp() + "/b"
    GraftTable.overwrite(rows.repartition(8, col("k")), pb, statsCols = Seq("x"))
    assert(GraftTable.readPrunedIn(spark, pb, "k", Seq(7)).filesRead == 8)
    GraftSql.dml(spark, s"ANALYZE graft.`$pb` COMPUTE BLOOM FOR COLUMNS (k)")
    val probe = GraftTable.readPrunedIn(spark, pb, "k", Seq(7))
    assert(probe.filesRead < 8 && probe.df.filter(col("k") === 7).count() == 1)
    // an all-NULL bloom column (a freshly ADDed one) still converges:
    // the files get an all-clear bloom, so a second ANALYZE is a no-op
    GraftTable.addColumn(pb, "tag", "STRING")
    val vb = GraftSql.dml(spark, s"ANALYZE graft.`$pb` COMPUTE BLOOM FOR COLUMNS (tag)")
    assert(GraftTable.analyzeStats(spark, pb, Nil, bloomCols = Seq("tag")) == vb,
      "all-NULL bloom backfill must be idempotent")
    // refusals: unknown column, and the parser wrapper routes the text
    intercept[Exception](
      GraftSql.dml(spark, s"ANALYZE graft.`$pb` COMPUTE STATS FOR COLUMNS (nope)"))
    val wrapped = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    assert(wrapped.parsePlan(s"ANALYZE TABLE graft.`$pb` COMPUTE BLOOM FOR COLUMNS (k)")
      .getClass.getSimpleName == "GraftAnalyzeCommand")
  }

  test("RESTORE and CLONE statements route to restore/cloneTable") {
    val root = tmp()
    val (src, sh, dp) = (s"$root/src", s"$root/shallow", s"$root/deep")
    GraftTable.overwrite(kv(1 -> "a", 2 -> "b"), src) // v1
    GraftTable.append(kv(3 -> "c"), src) // v2
    val v1ts = GraftTable.versions(src).head._2
    GraftSql.dml(spark, s"CREATE TABLE graft.`$sh` SHALLOW CLONE graft.`$src`")
    GraftSql.dml(spark, s"CREATE TABLE graft.`$dp` DEEP CLONE graft.`$src`")
    assert(canon(GraftTable.read(spark, sh)) == canon(GraftTable.read(spark, src)))
    assert(canon(GraftTable.read(spark, dp)) == canon(GraftTable.read(spark, src)))
    // RESTORE by version rolls the source back; clones are unaffected
    GraftSql.dml(spark, s"RESTORE TABLE graft.`$src` TO VERSION AS OF 1")
    assert(canon(GraftTable.read(spark, src)) == canon(kv(1 -> "a", 2 -> "b")))
    assert(GraftTable.read(spark, sh).count() == 3)
    // RESTORE by timestamp (v1's commit instant, epoch-micros string form)
    GraftTable.append(kv(9 -> "z"), src)
    GraftSql.dml(spark, s"RESTORE graft.`$src` TO TIMESTAMP AS OF '$v1ts'")
    assert(canon(GraftTable.read(spark, src)) == canon(kv(1 -> "a", 2 -> "b")))
    // and through the parser wrapper for spark.sql sessions
    val wrapped = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    assert(wrapped.parsePlan(s"RESTORE TABLE graft.`$src` TO VERSION AS OF 1")
      .getClass.getSimpleName == "GraftRestoreCommand")
    assert(wrapped.parsePlan(s"CREATE TABLE graft.`$root/c2` SHALLOW CLONE graft.`$src`")
      .getClass.getSimpleName == "GraftCloneCommand")
  }

  test("the injected parser rewrites graft DML at parse time, passes the rest through") {
    // spark.sql.extensions is a STATIC conf — a true extension session
    // needs its own SparkContext, which PlanAudit's JVM provides (its
    // builder sets the conf and runs spark.sql DML end-to-end). Here we
    // pin the wrapper itself around the session's real parser.
    val path = tmp() + "/t"
    GraftTable.overwrite(kv(1 -> "a", 2 -> "b"), path)
    val wrapped = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val del = wrapped.parsePlan(s"DELETE FROM graft.`$path` WHERE k = 1")
    assert(del.getClass.getSimpleName == "GraftDeleteCommand")
    del.asInstanceOf[org.apache.spark.sql.execution.command.RunnableCommand].run(spark)
    assert(canon(GraftTable.read(spark, path)) == canon(kv(2 -> "b")))
    assert(wrapped.parsePlan(s"MERGE INTO graft.`$path` t USING x s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT *").getClass.getSimpleName == "GraftMergeCommand")
    // non-graft statements are byte-identical to the delegate's plans
    assert(wrapped.parsePlan("SELECT 1 + 1") ==
      spark.sessionState.sqlParser.parsePlan("SELECT 1 + 1"))
    assert(wrapped.parsePlan("DELETE FROM other WHERE x = 1") ==
      spark.sessionState.sqlParser.parsePlan("DELETE FROM other WHERE x = 1"))
  }

  test("the injected resolution rule rewrites DML plans into runnable commands") {
    val path = tmp() + "/t"
    GraftTable.overwrite(kv(1 -> "a", 2 -> "b"), path)
    // what an extension-built session's analyzer does with the plan
    val parsed = spark.sessionState.sqlParser
      .parsePlan(s"DELETE FROM graft.`$path` WHERE k = 1")
    val rewritten = GraftDmlRule(spark)(parsed)
    assert(rewritten.getClass.getSimpleName == "GraftDeleteCommand")
    rewritten.asInstanceOf[org.apache.spark.sql.execution.command.RunnableCommand]
      .run(spark)
    assert(canon(GraftTable.read(spark, path)) == canon(kv(2 -> "b")))
    // non-graft DML passes through untouched for Spark's own resolution
    val foreign = spark.sessionState.sqlParser
      .parsePlan("DELETE FROM other_table WHERE x = 1")
    assert(GraftDmlRule(spark)(foreign) eq foreign)
  }

}
