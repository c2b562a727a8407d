package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftTable

/** Merge-on-read DELETE via deletion vectors ([[GraftTable.deleteWhereMor]]):
  * no data-file rewrite, exact semantics, and composition with time
  * travel, DML, purge, compaction, vacuum, diff/CDC, and clones. */
class GraftDvSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._
  graft.plans.GraftSql.install(spark)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dv").toString

  private def nums(path: String, n: Int = 100, files: Int = 4): Unit =
    GraftTable.overwrite(
      (1 to n).map(i => (i, s"v$i", i % 10)).toDF("k", "v", "g").repartition(files),
      path, statsCols = Seq("k")): Unit

  private def dataFiles(path: String): Map[String, (Long, Long)] =
    Option(new File(path, "data").listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length, f.lastModified))).toMap

  private def keys(path: String): Seq[Int] =
    GraftTable.read(spark, path).select("k").as[Int].collect().sorted.toSeq

  test("MOR delete removes rows without touching any data file") {
    val path = tmp(); nums(path)
    val before = dataFiles(path)
    val v = GraftTable.deleteWhereMor(spark, path, col("k") % 10 === 3)
    assert(v == 2L)
    assert(keys(path) == (1 to 100).filterNot(_ % 10 == 3))
    // not one data file rewritten, moved, or added
    assert(dataFiles(path) == before)
    // history shows the op and the live row count
    val h = GraftTable.history(spark, path).filter(col("version") === 2).head
    assert(h.getAs[String]("op") == "delete_mor")
    assert(h.getAs[Long]("n_rows") == 90L)
    // the per-file detail exposes the vectors — including the purge-
    // scheduling signal (sidecar bytes + masked fraction per file)
    val det = GraftTable.describeFiles(spark, path)
    assert(det.agg(sum("n_deleted")).head.getLong(0) == 10L)
    assert(det.agg(sum("n_rows")).head.getLong(0) == 90L)
    val dvd = det.filter(col("n_deleted") > 0)
    assert(dvd.filter(col("dv_bytes") > 0).count() == dvd.count())
    assert(dvd.filter(col("deleted_frac") > 0 && col("deleted_frac") <= 1).count()
      == dvd.count())
    assert(det.filter(col("n_deleted") === 0)
      .filter(col("deleted_frac") =!= 0.0).count() == 0)
  }

  test("NULL predicate rows are kept — SQL DELETE semantics") {
    val path = tmp()
    GraftTable.overwrite(
      df("k INT, v STRING", org.apache.spark.sql.Row(Int.box(1), "a"),
        org.apache.spark.sql.Row(Int.box(2), null),
        org.apache.spark.sql.Row(Int.box(3), "c")), path)
    GraftTable.deleteWhereMor(spark, path, col("v") < "b")
    assert(keys(path) == Seq(2, 3)) // NULL comparison kept row 2
  }

  test("successive deletes merge vectors; re-deleting is a no-op") {
    val path = tmp(); nums(path)
    GraftTable.deleteWhereMor(spark, path, col("k") <= 5)
    GraftTable.deleteWhereMor(spark, path, col("k") <= 10) // overlap 1..5
    assert(keys(path) == (11 to 100).toSeq)
    val det = GraftTable.describeFiles(spark, path)
    assert(det.agg(sum("n_deleted")).head.getLong(0) == 10L)
    // deleting already-deleted rows commits a version with no new vectors
    val v3 = GraftTable.deleteWhereMor(spark, path, col("k") <= 10)
    assert(keys(path) == (11 to 100).toSeq)
    assert(GraftTable.describeFiles(spark, path)
      .agg(sum("n_deleted")).head.getLong(0) == 10L)
    assert(v3 == 4L)
  }

  test("a fully-deleted file drops from the manifest") {
    val path = tmp()
    // two files split by range so one dies entirely
    GraftTable.writeClustered((1 to 40).map(i => (i, s"v$i")).toDF("k", "v"),
      path, col("k"), numFiles = 2, statsCols = Seq("k"))
    val filesBefore = GraftTable.describeFiles(spark, path).count()
    assert(filesBefore == 2)
    GraftTable.deleteWhereMor(spark, path, col("k") <= 20)
    assert(GraftTable.describeFiles(spark, path).count() == 1)
    assert(keys(path) == (21 to 40).toSeq)
  }

  test("time travel reads each version's exact delete state") {
    val path = tmp(); nums(path, n = 20, files = 2)
    GraftTable.deleteWhereMor(spark, path, col("k") <= 5)
    GraftTable.deleteWhereMor(spark, path, col("k") <= 10)
    assert(GraftTable.readVersion(spark, path, 1).count() == 20)
    assert(GraftTable.readVersion(spark, path, 2).select("k").as[Int].collect().sorted.toSeq ==
      (6 to 20).toSeq)
    assert(GraftTable.readVersion(spark, path, 3).count() == 10)
  }

  test("COW update and upsert over a dv'd file never resurrect deleted rows") {
    val path = tmp(); nums(path, n = 20, files = 2)
    GraftTable.deleteWhereMor(spark, path, col("k") === 7)
    // update rewrites the touched file, folding its vector
    GraftTable.updateWhere(spark, path, col("k") === 8, Map("v" -> lit("X")))
    assert(keys(path) == (1 to 20).filterNot(_ == 7))
    assert(GraftTable.read(spark, path).filter(col("k") === 8)
      .select("v").as[String].head == "X")
    // upsert on top
    GraftTable.upsertByKey(spark, path,
      Seq((9, "Y", 9)).toDF("k", "v", "g"), Seq("k"))
    assert(keys(path) == (1 to 20).filterNot(_ == 7))
    // a rewritten file folds its vector — total deleted never exceeds
    // the one masked row, and re-reading stays exact
    assert(GraftTable.describeFiles(spark, path)
      .agg(sum("n_deleted")).head.getLong(0) <= 1L)
  }

  test("purgeDeletes rewrites exactly the dv'd files") {
    val path = tmp()
    GraftTable.writeClustered((1 to 60).map(i => (i, s"v$i")).toDF("k", "v"),
      path, col("k"), numFiles = 3, statsCols = Seq("k"))
    GraftTable.deleteWhereMor(spark, path, col("k") === 5,
      pruneRanges = Seq(GraftTable.ColRange("k", Some(5), Some(5))))
    val before = dataFiles(path)
    val (purged, v) = GraftTable.purgeDeletes(spark, path)
    assert(purged == 1 && v == 3L)
    // the two clean files carried byte-identical; one file replaced
    val after = dataFiles(path)
    val carried = before.keySet intersect after.keySet
    assert(carried.size >= 2)
    carried.foreach(f => assert(before(f) == after(f)))
    assert(keys(path) == (1 to 60).filterNot(_ == 5))
    assert(GraftTable.describeFiles(spark, path)
      .agg(sum("n_deleted")).head.getLong(0) == 0L)
    // idempotent: nothing left to purge → no commit
    assert(GraftTable.purgeDeletes(spark, path) == ((0, 3L)))
  }

  test("compaction folds vectors too") {
    val path = tmp(); nums(path, n = 50, files = 5)
    GraftTable.deleteWhereMor(spark, path, col("k") % 7 === 0)
    GraftTable.compactFiles(spark, path, targetBytes = 1L << 30, statsCols = Seq("k"))
    assert(keys(path) == (1 to 50).filterNot(_ % 7 == 0))
    assert(GraftTable.describeFiles(spark, path)
      .agg(sum("n_deleted")).head.getLong(0) == 0L)
  }

  test("vacuum keeps referenced sidecars and reclaims orphans") {
    val path = tmp()
    // clustered layout so both deletes touch exactly ONE file — the
    // sidecar arithmetic below is deterministic
    GraftTable.writeClustered((1 to 30).map(i => (i, s"v$i", i % 10))
      .toDF("k", "v", "g"), path, col("k"), numFiles = 3, statsCols = Seq("k"))
    GraftTable.deleteWhereMor(spark, path, col("k") <= 3)  // v2: dv A
    GraftTable.deleteWhereMor(spark, path, col("k") <= 6)  // v3: dv B (A now orphanable)
    def dvFiles() = Option(new File(path, "_dv").listFiles).getOrElse(Array.empty)
      .count(_.getName.endsWith(".dv"))
    assert(dvFiles() >= 2)
    // keep v2+v3: both vectors still referenced
    GraftTable.vacuum(path, keepVersions = 2)
    assert(dvFiles() == 2)
    assert(keys(path) == (7 to 30).toSeq)
    assert(GraftTable.readVersion(spark, path, 2).count() == 27)
    // drop to head only: superseded vector reclaims
    GraftTable.vacuum(path, keepVersions = 1)
    assert(dvFiles() == 1)
    assert(keys(path) == (7 to 30).toSeq)
    // purge then vacuum: physical erasure completes, zero sidecars
    GraftTable.purgeDeletes(spark, path)
    GraftTable.vacuum(path, keepVersions = 1)
    assert(dvFiles() == 0)
    assert(keys(path) == (7 to 30).toSeq)
  }

  test("diffVersions sees exact row-level deletes through a vector swap") {
    val path = tmp(); nums(path, n = 20, files = 2)
    GraftTable.deleteWhereMor(spark, path, col("k") === 4 || col("k") === 15)
    val d = GraftTable.diffVersions(spark, path, 1, 2, Seq("k"))
    val rows = d.select("k", "change_type").as[(Int, String)].collect().sorted.toSeq
    assert(rows == Seq((4, "delete"), (15, "delete")))
    // and across a span mixing MOR delete with an append
    GraftTable.append(Seq((100, "new", 0)).toDF("k", "v", "g"), path)
    val d2 = GraftTable.diffVersions(spark, path, 1, 3, Seq("k"))
    assert(d2.select("k", "change_type").as[(Int, String)].collect().sorted.toSeq ==
      Seq((4, "delete"), (15, "delete"), (100, "insert")))
  }

  test("readSince surfaces a vector swap as a changed file") {
    val path = tmp(); nums(path, n = 20, files = 2)
    GraftTable.deleteWhereMor(spark, path, col("k") === 4)
    val (df1, v) = GraftTable.readSince(spark, path, 1)
    assert(v == 2L)
    // the touched file re-surfaces with CURRENT live rows (no k=4)
    val got = df1.select("k").as[Int].collect().sorted.toSeq
    assert(got.nonEmpty && !got.contains(4))
  }

  test("CDC replica converges through a MOR delete") {
    val src = tmp(); val dst = tmp()
    nums(src, n = 20, files = 2)
    GraftTable.syncReplica(spark, src, dst, Seq("k"))
    GraftTable.deleteWhereMor(spark, src, col("k") <= 3)
    GraftTable.syncReplica(spark, src, dst, Seq("k"))
    assert(keys(dst) == (4 to 20).toSeq)
  }

  test("shallow and deep clones carry the vectors") {
    val src = tmp()
    nums(src, n = 20, files = 2)
    GraftTable.deleteWhereMor(spark, src, col("k") <= 5)
    val sh = tmp() + "/clone_s"; val dp = tmp() + "/clone_d"
    GraftTable.cloneTable(spark, src, sh)
    GraftTable.cloneTable(spark, src, dp, deep = true)
    assert(GraftTable.read(spark, sh).select("k").as[Int].collect().sorted.toSeq ==
      (6 to 20).toSeq)
    assert(GraftTable.read(spark, dp).select("k").as[Int].collect().sorted.toSeq ==
      (6 to 20).toSeq)
    // a MOR delete in the shallow clone merges against the source's
    // vector without touching the source
    GraftTable.deleteWhereMor(spark, sh, col("k") === 6)
    assert(GraftTable.read(spark, sh).count() == 14)
    assert(GraftTable.read(spark, src).count() == 15)
  }

  test("restore to a pre-delete version resurrects the rows") {
    val path = tmp(); nums(path, n = 20, files = 2)
    GraftTable.deleteWhereMor(spark, path, col("k") <= 10)
    assert(GraftTable.read(spark, path).count() == 10)
    GraftTable.restore(path, 1L)
    assert(keys(path) == (1 to 20).toSeq)
  }

  test("format(\"graft\") and the TVFs read dv'd tables") {
    val path = tmp(); nums(path, n = 20, files = 2)
    GraftTable.deleteWhereMor(spark, path, col("k") % 2 === 0)
    val viaSource = spark.read.format("graft").load(path)
      .select("k").as[Int].collect().sorted.toSeq
    assert(viaSource == (1 to 20).filter(_ % 2 == 1))
    assert(spark.read.format("graft").option("versionAsOf", "1").load(path).count() == 20)
    // pushdown interplay: a filter over the dv'd relation stays exact
    assert(spark.read.format("graft").load(path)
      .filter(col("k") <= 6).count() == 3)
  }

  test("stats pruning composes with vectors") {
    val path = tmp()
    GraftTable.writeClustered((1 to 100).map(i => (i, s"v$i")).toDF("k", "v"),
      path, col("k"), numFiles = 4, statsCols = Seq("k"))
    GraftTable.deleteWhereMor(spark, path, col("k") === 10)
    val scan = GraftTable.readPruned(spark, path,
      Seq(GraftTable.ColRange("k", Some(1), Some(12))))
    assert(scan.filesRead < scan.filesTotal) // pruning still prunes
    assert(scan.df.filter(col("k") <= 12).count() == 11) // and k=10 stays dead
  }

  test("MOR delete composes with renamed columns") {
    val path = tmp(); nums(path, n = 20, files = 2)
    GraftTable.renameColumn(path, "k", "id")
    GraftTable.deleteWhereMor(spark, path, col("id") <= 5)
    assert(GraftTable.read(spark, path).select("id").as[Int].collect().sorted.toSeq ==
      (6 to 20).toSeq)
    // and the rename projection still resolves under time travel
    assert(GraftTable.readVersion(spark, path, 2).count() == 20)
  }

  test("CDC stream emits ONLY the delta rows through a vector swap") {
    import org.apache.spark.sql.streaming.Trigger
    import scala.collection.JavaConverters._
    val path = tmp() + "/t"
    GraftTable.overwrite((1 to 50).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      path, statsCols = Seq("k"))                       // v1: one 50-row file
    GraftTable.deleteWhereMor(spark, path, col("k") <= 3) // v2: dv swap, 3 rows
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    val q = spark.readStream.format("graft").option("readChangeFeed", "true").load(path)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add((r.getInt(0), r.getString(2), r.getLong(3)))): Unit
      }.start()
    q.awaitTermination()
    val events = got.iterator().asScala.toSeq
    // the MOR commit streamed 3 delete rows — NOT the 50-row file twice
    assert(events.filter(_._3 == 2L) ==
      events.filter(_._3 == 2L).filter(_._2 == "delete"))
    assert(events.filter(_._3 == 2L).map(_._1).sorted == Seq(1, 2, 3))
    assert(events.count(_._3 == 1L) == 50)
    // restore un-deletes: the swap reverses and streams 3 INSERTS
    GraftTable.restore(path, 1L)                          // v3
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    val q2 = spark.readStream.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", "3").load(path)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got2.add((r.getInt(0), r.getString(2), r.getLong(3)))): Unit
      }.start()
    q2.awaitTermination()
    val ev2 = got2.iterator().asScala.toSeq
    assert(ev2.map(e => (e._1, e._2)).sorted ==
      Seq((1, "insert"), (2, "insert"), (3, "insert")))
  }

  test("append-only stream refuses a MOR delete; ignoreChanges re-emits live rows") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp() + "/t"
    GraftTable.overwrite((1 to 10).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), path)
    GraftTable.deleteWhereMor(spark, path, col("k") <= 4)
    val strict = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("dv_strict")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      strict.awaitTermination()
    }
    assert(e.getCause.getMessage.contains("append-only"))
    val loose = spark.readStream.format("graft").option("ignoreChanges", "true")
      .load(path).writeStream.format("memory").queryName("dv_loose")
      .trigger(Trigger.AvailableNow()).start()
    loose.awaitTermination()
    // v1 emitted all 10; v2 re-emitted the file's LIVE rows (6) only
    val ks = spark.table("dv_loose").select("k").as[Int].collect().toSeq
    assert(ks.sorted == ((1 to 10) ++ (5 to 10)).sorted)
  }

  test("TBLPROPERTIES: set/unset/show, carried by every commit, clone inherits") {
    import graft.plans.GraftSql
    val path = tmp() + "/t"
    nums(path, n = 10, files = 1)
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` SET TBLPROPERTIES(" +
      "'graft.deletionVectors'='true', 'team'='data-eng')")
    assert(GraftTable.propertiesOf(path) ==
      Map("graft.deletionVectors" -> "true", "team" -> "data-eng"))
    // carried through ordinary commits
    GraftTable.append(Seq((11, "x", 1)).toDF("k", "v", "g"), path)
    assert(GraftTable.propertiesOf(path).size == 2)
    // SHOW via the wrapped parser and via the TVF
    val wrapped = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val show = wrapped.parsePlan(s"SHOW TBLPROPERTIES graft.`$path`")
      .asInstanceOf[org.apache.spark.sql.execution.command.RunnableCommand].run(spark)
    assert(show.map(r => (r.getString(0), r.getString(1))).toMap ==
      GraftTable.propertiesOf(path))
    assert(spark.sql(s"SELECT value FROM graft_table_properties('$path') " +
      "WHERE key = 'team'").head.getString(0) == "data-eng")
    // UNSET; strict refusal without IF EXISTS
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` UNSET TBLPROPERTIES IF EXISTS ('nope')")
    intercept[Exception](GraftSql.dml(spark,
      s"ALTER TABLE graft.`$path` UNSET TBLPROPERTIES ('nope')"))
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` UNSET TBLPROPERTIES ('team')")
    assert(GraftTable.propertiesOf(path) == Map("graft.deletionVectors" -> "true"))
    // a clone inherits
    val c = tmp() + "/c"
    GraftTable.cloneTable(spark, path, c)
    assert(GraftTable.propertiesOf(c) == Map("graft.deletionVectors" -> "true"))
  }

  test("DELETE FROM dispatches on graft.deletionVectors") {
    import graft.plans.GraftSql
    val path = tmp() + "/t"
    nums(path, n = 40, files = 2)
    // default: copy-on-write — the touched data file is REPLACED
    val before = dataFiles(path)
    GraftSql.dml(spark, s"DELETE FROM graft.`$path` WHERE k = 1")
    assert(dataFiles(path).keySet != before.keySet)
    assert(keys(path) == (2 to 40).toSeq)
    // enable vectors: same statement, merge-on-read — files untouched
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` SET TBLPROPERTIES(" +
      "'graft.deletionVectors'='true')")
    val cow = dataFiles(path)
    GraftSql.dml(spark, s"DELETE FROM graft.`$path` WHERE k <= 5")
    assert(dataFiles(path) == cow)
    assert(keys(path) == (6 to 40).toSeq)
    assert(GraftTable.history(spark, path)
      .orderBy(col("version").desc).head.getAs[String]("op") == "delete_mor")
    // REORG APPLY (PURGE) folds the vectors physically
    val purged = GraftSql.dml(spark, s"REORG TABLE graft.`$path` APPLY (PURGE)")
    assert(purged >= 1)
    assert(keys(path) == (6 to 40).toSeq)
    assert(GraftTable.describeFiles(spark, path)
      .agg(sum("n_deleted")).head.getLong(0) == 0L)
  }

  test("MOR update masks old images and appends only the changed rows") {
    val path = tmp()
    GraftTable.writeClustered((1 to 60).map(i => (i, s"v$i")).toDF("k", "v"),
      path, col("k"), numFiles = 3, statsCols = Seq("k"))
    val before = dataFiles(path)
    GraftTable.updateWhereMor(spark, path, col("k") % 20 === 0,
      Map("v" -> lit("UPDATED")),
      pruneRanges = Seq(GraftTable.ColRange("k", Some(20), Some(60))))
    // original data files untouched; only appended image files are new
    val after = dataFiles(path)
    assert(before.keySet.subsetOf(after.keySet))
    before.foreach { case (f, sig) => assert(after(f) == sig) }
    assert(after.size > before.size)
    // semantics exact
    val got = GraftTable.read(spark, path).as[(Int, String)].collect().toMap
    assert(got == (1 to 60).map(i =>
      i -> (if (i % 20 == 0) "UPDATED" else s"v$i")).toMap)
    // time travel reads the pre-update images
    assert(GraftTable.readVersion(spark, path, 1).filter(col("k") === 20)
      .select("v").as[String].head == "v20")
    // diff classifies the change as an update
    val d = GraftTable.diffVersions(spark, path, 1, 2, Seq("k"))
    assert(d.select("k", "change_type").as[(Int, String)].collect().sorted.toSeq ==
      Seq((20, "update"), (40, "update"), (60, "update")))
    // op recorded; a second update composes (merges vectors, appends again)
    assert(GraftTable.history(spark, path)
      .orderBy(col("version").desc).head.getAs[String]("op") == "update_mor")
    GraftTable.updateWhereMor(spark, path, col("k") === 20, Map("v" -> lit("TWICE")))
    assert(GraftTable.read(spark, path).filter(col("k") === 20)
      .select("v").as[String].head == "TWICE")
    assert(GraftTable.read(spark, path).count() == 60)
  }

  test("SQL UPDATE dispatches merge-on-read under the property; CHECKs gate images") {
    import graft.plans.GraftSql
    val path = tmp() + "/t"
    nums(path, n = 30, files = 2)
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` SET TBLPROPERTIES(" +
      "'graft.deletionVectors'='true')")
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` ADD CONSTRAINT pos_k CHECK (k > 0)")
    val before = dataFiles(path)
    GraftSql.dml(spark, s"UPDATE graft.`$path` SET v = 'X' WHERE k = 7")
    before.foreach { case (f, sig) => assert(dataFiles(path)(f) == sig) }
    assert(GraftTable.history(spark, path)
      .orderBy(col("version").desc).head.getAs[String]("op") == "update_mor")
    assert(GraftTable.read(spark, path).filter(col("k") === 7)
      .select("v").as[String].head == "X")
    // an update whose IMAGES violate a CHECK refuses before committing
    val v = GraftTable.currentVersion(path).get
    intercept[Exception](GraftSql.dml(spark,
      s"UPDATE graft.`$path` SET k = -1 WHERE k = 8"))
    assert(GraftTable.currentVersion(path).get == v)
    assert(GraftTable.read(spark, path).filter(col("k") === 8).count() == 1)
  }

  test("MOR merge masks only clause-fired rows, appends images + inserts") {
    val path = tmp()
    GraftTable.writeClustered(
      (1 to 60).map(i => (i, s"v$i", if (i % 3 == 0) "F" else "O")).toDF("k", "v", "st"),
      path, col("k"), numFiles = 3, statsCols = Seq("k"))
    val before = dataFiles(path)
    // source: k in 10..70 — delete F rows, re-label O rows, insert 61..70
    val src = (10 to 70).map(i => (i, s"s$i", "S")).toDF("k", "v", "st")
    GraftTable.mergeIntoMor(spark, path, src, Seq("k"),
      updateSet = Map("v" -> GraftTable.srcCol("v")),
      updateWhen = Some(col("st") === "O"),
      deleteWhen = Some(col("st") === "F"))
    // untouched-file byte identity: every original data file still
    // byte-identical — the merge wrote only sidecars + appended images
    val after = dataFiles(path)
    assert(before.keySet.subsetOf(after.keySet))
    before.foreach { case (f, sig) => assert(after(f) == sig) }
    assert(GraftTable.history(spark, path)
      .orderBy(col("version").desc).head.getAs[String]("op") == "merge_mor")
    // exact COW-merge semantics
    val got = GraftTable.read(spark, path).as[(Int, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val expect = ((1 to 60).flatMap { i =>
      if (i >= 10 && i % 3 == 0) None // matched F -> deleted
      else if (i >= 10) Some(i -> ((s"s$i", if (i % 3 == 0) "F" else "O"))) // matched O -> relabeled v
      else Some(i -> ((s"v$i", if (i % 3 == 0) "F" else "O"))) // below source range: untouched
    } ++ (61 to 70).map(i => i -> ((s"s$i", "S")))).toMap
    assert(got == expect)
    // rows matched by key but no clause fired stay unmasked: only F
    // (delete) and O (update) exist here, so check a sub-case — a merge
    // whose clauses fire nowhere commits no masks and no images
    val v = GraftTable.currentVersion(path).get
    GraftTable.mergeIntoMor(spark, path,
      (1 to 5).map(i => (i, "zz", "Z")).toDF("k", "v", "st"), Seq("k"),
      updateSet = Map("v" -> GraftTable.srcCol("v")),
      updateWhen = Some(col("st") === "NEVER"),
      insertNotMatched = false)
    val m = GraftTable.currentManifest(path).get
    assert(m.version == v + 1)
    assert(m.changes.get.added.isEmpty && m.changes.get.removed.isEmpty,
      "no clause fired -> no masks, no images")
    // CDC classification: the merge's masked+appended rows fold as the
    // update/delete/insert mix it is
    val d = GraftTable.diffVersions(spark, path, 1, 2, Seq("k"))
      .groupBy(col("change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(d("delete") == (10 to 60).count(_ % 3 == 0).toLong)
    assert(d("update") == (10 to 60).count(_ % 3 != 0).toLong)
    assert(d("insert") == 10L)
    // time travel: pre-merge images intact
    assert(GraftTable.readVersion(spark, path, 1).count() == 60)
  }

  test("SQL MERGE dispatches merge-on-read under the property") {
    import graft.plans.GraftSql
    val path = tmp() + "/t"
    nums(path, n = 30, files = 2)
    GraftSql.dml(spark, s"ALTER TABLE graft.`$path` SET TBLPROPERTIES(" +
      "'graft.deletionVectors'='true')")
    val before = dataFiles(path)
    (28 to 35).map(i => (i, s"m$i", 0)).toDF("k", "v", "g")
      .createOrReplaceTempView("dv_merge_src")
    GraftSql.dml(spark, s"""
      MERGE INTO graft.`$path` AS t USING dv_merge_src AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    before.foreach { case (f, sig) => assert(dataFiles(path)(f) == sig) }
    assert(GraftTable.history(spark, path)
      .orderBy(col("version").desc).head.getAs[String]("op") == "merge_mor")
    val got = GraftTable.read(spark, path).select("k", "v").as[(Int, String)]
      .collect().toMap
    assert(got == ((1 to 27).map(i => i -> s"v$i") ++
      (28 to 35).map(i => i -> s"m$i")).toMap)
    // REORG PURGE folds the merge's vectors back into clean files
    GraftSql.dml(spark, s"REORG TABLE graft.`$path` APPLY (PURGE)")
    assert(GraftTable.filesOf(path,
      GraftTable.currentManifest(path).get).forall(_.dv.isEmpty))
    assert(GraftTable.read(spark, path).select("k", "v").as[(Int, String)]
      .collect().toMap == got)
  }

  test("MOR replaceWhere masks boundary rows, drops covered files, appends source") {
    val path = tmp()
    // 4 clustered files over contiguous keys; the region bounds come
    // from the manifest's own stats so the cover is exact whatever
    // boundaries the range partitioner chose: [lo, hi] wholly covers
    // file 2 (drops) and masks the first 10 keys of file 3 (vector)
    GraftTable.writeClustered(
      (1 to 100).map(i => (i, s"v$i", i % 10)).toDF("k", "v", "g"),
      path, col("k"), 4, statsCols = Seq("k"))
    val before = dataFiles(path)
    val byMin = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .sortBy(_.stats("k").min.get.toInt)
    val lo = byMin(1).stats("k").min.get.toInt
    val hi = byMin(2).stats("k").min.get.toInt + 9
    val repl = Seq(lo, lo + 1, hi).map(i => (i, s"R$i", 0)).toDF("k", "v", "g")
    val v = GraftTable.overwriteWhereMor(spark, path, repl,
      col("k").between(lo, hi),
      pruneRanges = Seq(GraftTable.ColRange("k", Some(lo), Some(hi))))
    val m = GraftTable.currentManifest(path).get
    assert(m.op == "replace_where_mor" && m.version == v)
    assert(keys(path) == ((1 until lo) ++ Seq(lo, lo + 1, hi) ++ (hi + 1 to 100)))
    assert(GraftTable.read(spark, path).filter(col("k") === lo)
      .select("v").head.getString(0) == s"R$lo")
    // not one data file rewritten; the covered file left the manifest
    assert(dataFiles(path).filter(kv => before.contains(kv._1)) == before)
    val entries = GraftTable.filesOf(path, m)
    val carriedOld = entries.filter(fe => before.contains(fe.path.split('/').last))
    assert(carriedOld.size == 3, s"expected 3 carried files, got ${carriedOld.size}")
    // exactly one boundary file carries a vector, masking k 51-60
    val dvd = carriedOld.filter(_.dv.isDefined)
    assert(dvd.size == 1 && dvd.head.dv.get.rows == 10)
    // time travel still reads the pre-replace world
    assert(GraftTable.readVersion(spark, path, v - 1).count() == 100)
    // stray refusal unchanged in the MOR form
    intercept[IllegalArgumentException] {
      GraftTable.overwriteWhereMor(spark, path, repl, col("k") > 90)
    }
    // SQL REPLACE WHERE dispatches merge-on-read under the property
    val p2 = tmp()
    GraftTable.writeClustered(
      (1 to 100).map(i => (i, s"v$i", i % 10)).toDF("k", "v", "g"),
      p2, col("k"), 4, statsCols = Seq("k"))
    GraftTable.setProperties(p2, Map("graft.deletionVectors" -> "true"))
    Seq((30, "R30", 0)).toDF("k", "v", "g").createOrReplaceTempView("dv_rw_src")
    graft.plans.GraftSql.dml(spark,
      s"INSERT INTO graft.`$p2` REPLACE WHERE k >= 26 AND k <= 60 " +
        "SELECT k, v, g FROM dv_rw_src")
    assert(GraftTable.currentManifest(p2).get.op == "replace_where_mor")
    assert(keys(p2) == ((1 to 25) ++ Seq(30) ++ (61 to 100)))
  }

  test("old manifests without dv fields still parse (format compatibility)") {
    val path = tmp(); nums(path, n = 10, files = 1)
    // the v1 manifest was written by THIS code but contains no dv keys
    // (None fields are omitted); re-reading proves absence-tolerant parse
    assert(GraftTable.read(spark, path).count() == 10)
    val m = new File(path, "_graft_log").listFiles.filter(_.getName.endsWith(".json")).head
    val txt = new String(java.nio.file.Files.readAllBytes(m.toPath))
    assert(!txt.contains("\"dv\"") && !txt.contains("dvRows"))
  }
}
