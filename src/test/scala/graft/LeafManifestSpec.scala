package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.Files
import graft.core.GraftTable
import graft.core.GraftTable.{ColRange, ColStats, FileEntry, LeafRef, Manifest}

/** The two-level (leaf) manifest layer: commit cost bounded by
  * O(new files + leaf count) via pointer reuse, leaf-level pruning that
  * never parses provably-clean leaves, COW carry of untouched leaves,
  * vacuum of orphaned leaves, and sub-linear read planning at 10⁴ file
  * entries. Thresholds shrink to test scale and restore in finally. */
class LeafManifestSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_leafspec").toString + "/t"

  private def withSmallLimits[A](inline: Int, maxLeaves: Int)(body: => A): A = {
    val (si, sm) = (GraftTable.InlineFileLimit, GraftTable.MaxLeaves)
    GraftTable.InlineFileLimit = inline
    GraftTable.MaxLeaves = maxLeaves
    try body finally { GraftTable.InlineFileLimit = si; GraftTable.MaxLeaves = sm }
  }

  private def leafNames(path: String): Seq[String] =
    GraftTable.currentManifest(path).get.leaves.getOrElse(Nil).map(_.path)

  test("appends spill to leaves, reuse them by pointer, and bound the inline list") {
    withSmallLimits(inline = 4, maxLeaves = 100) {
      val path = tmp()
      (1 to 12).foreach { i =>
        GraftTable.append(
          Seq.tabulate(10)(j => (i * 100 + j, s"v$i")).toDF("id", "v").coalesce(1),
          path, statsCols = Seq("id"))
        // pointer reuse: every leaf of the PREVIOUS commit survives into
        // the next one verbatim (no leaf rewrite on append)
      }
      val m = GraftTable.currentManifest(path).get
      assert(m.files.size <= 4, s"inline list must stay bounded, got ${m.files.size}")
      assert(m.leaves.exists(_.nonEmpty), "appends past the cap must have spilled leaves")
      assert(GraftTable.read(spark, path).count() === 120L)
      // append once more and diff the leaf sets: old leaves carry by name
      val before = leafNames(path).toSet
      GraftTable.append(Seq((9999, "x")).toDF("id", "v").coalesce(1), path,
        statsCols = Seq("id"))
      val after = leafNames(path).toSet
      assert(before.subsetOf(after), "append must reuse parent leaves by pointer")
      // history stays readable through the leaf layer
      assert(GraftTable.readVersion(spark, path, 6).count() === 60L)
    }
  }

  test("leaf consolidation keeps the leaf count bounded") {
    withSmallLimits(inline = 1, maxLeaves = 4) {
      val path = tmp()
      (1 to 20).foreach { i =>
        GraftTable.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), path,
          statsCols = Seq("id"))
      }
      val m = GraftTable.currentManifest(path).get
      val leafCount = m.leaves.getOrElse(Nil).size
      assert(leafCount <= 4 + 1, s"size-tiered merge must bound leaves, got $leafCount")
      assert(GraftTable.read(spark, path).count() === 20L)
    }
  }

  test("pruned reads never parse provably-clean leaves") {
    withSmallLimits(inline = 2, maxLeaves = 100) {
      val path = tmp()
      // disjoint id ranges per append → disjoint leaf aggregate ranges
      (0 until 8).foreach { i =>
        GraftTable.append(
          Seq.tabulate(20)(j => (i * 1000 + j, i)).toDF("id", "chunk").coalesce(1),
          path, statsCols = Seq("id"))
      }
      val want = GraftTable.readPruned(spark, path,
        Seq(ColRange("id", Some(2000), Some(2019))))
      assert(want.df.count() === 20L)
      assert(want.filesRead < want.filesTotal,
        s"pruning must skip files: read ${want.filesRead} of ${want.filesTotal}")
      // the proof clean leaves are never parsed: corrupt every leaf whose
      // aggregate range can't hold [2000, 2019] — the same pruned read
      // must still plan and return identical rows (a parse would throw)
      val m = GraftTable.currentManifest(path).get
      m.leaves.getOrElse(Nil).foreach { l =>
        val lo = l.stats("id").min.map(_.toLong).getOrElse(Long.MinValue)
        val hi = l.stats("id").max.map(_.toLong).getOrElse(Long.MaxValue)
        if (hi < 2000 || lo > 2019)
          Files.write(new File(path + "/_graft_log", l.path).toPath,
            "NOT JSON".getBytes("UTF-8"))
      }
      val again = GraftTable.readPruned(spark, path,
        Seq(ColRange("id", Some(2000), Some(2019))))
      assert(again.df.count() === 20L)
    }
  }

  test("upsert carries untouched leaves by pointer and rewrites only touched files") {
    withSmallLimits(inline = 2, maxLeaves = 100) {
      val path = tmp()
      (0 until 6).foreach { i =>
        GraftTable.append(
          Seq.tabulate(10)(j => (i * 1000 + j, "old")).toDF("id", "v").coalesce(1),
          path, statsCols = Seq("id"))
      }
      val leavesBefore = leafNames(path).toSet
      assert(leavesBefore.nonEmpty)
      GraftTable.upsertByKey(spark,  path,
        Seq((3000, "new"), (3001, "new")).toDF("id", "v"), Seq("id"),
        statsCols = Seq("id"))
      val carried = leafNames(path).toSet intersect leavesBefore
      assert(carried.nonEmpty, "clean leaves must carry into the upsert commit by pointer")
      val out = GraftTable.read(spark, path)
      assert(out.count() === 60L)
      assert(out.filter($"v" === "new").count() === 2L)
      assert(out.filter($"id" === 3002 && $"v" === "old").count() === 1L)
    }
  }

  test("vacuum deletes leaves no retained manifest references") {
    withSmallLimits(inline = 1, maxLeaves = 100) {
      val path = tmp()
      (1 to 5).foreach { i =>
        GraftTable.append(Seq((i, i)).toDF("id", "v").coalesce(1), path)
      }
      assert(leafNames(path).nonEmpty)
      // overwrite drops every leaf from the live snapshot
      GraftTable.overwrite(Seq((1, 1)).toDF("id", "v").coalesce(1), path)
      GraftTable.vacuum(path, keepVersions = 1)
      val logDir = new File(path, "_graft_log")
      val leafFiles = Option(logDir.listFiles).getOrElse(Array.empty[File])
        .filter(_.getName.startsWith("leaf-"))
      assert(leafFiles.isEmpty, s"orphan leaves must be vacuumed, found ${leafFiles.length}")
      assert(GraftTable.read(spark, path).count() === 1L)
    }
  }

  test("appendEvolve widens the schema in one commit; old versions keep theirs") {
    val path = tmp()
    GraftTable.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    // batch with a NEW column and a MISSING one
    GraftTable.appendEvolve(
      Seq((3, 9.5)).toDF("id", "score"), path)
    val out = GraftTable.read(spark, path)
    assert(out.columns.toSeq === Seq("id", "v", "score"))
    val rows = out.collect().map(r =>
      (r.getInt(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(rows === Seq((1, Some("a"), None), (2, Some("b"), None), (3, None, Some(9.5))))
    // time travel: version 1 still has the pre-evolution schema
    assert(GraftTable.readVersion(spark, path, 1).columns.toSeq === Seq("id", "v"))
    // type conflict refuses loudly
    val err = intercept[IllegalArgumentException](
      GraftTable.appendEvolve(Seq(("x", "y")).toDF("id", "v"), path))
    assert(err.getMessage.contains("type conflict"))
    // a dropped-then-re-added name must NOT resurrect old values
    GraftTable.dropColumn(path, "v")
    GraftTable.appendEvolve(Seq((4, "fresh")).toDF("id", "v"), path)
    val revived = GraftTable.read(spark, path).select("id", "v").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(revived === Seq((1, None), (2, None), (3, None), (4, Some("fresh"))))
  }

  test("appendEvolve with an unchanged schema carries leaves by pointer") {
    withSmallLimits(inline = 1, maxLeaves = 100) {
      val path = tmp()
      (1 to 4).foreach(i => GraftTable.append(
        Seq((i, s"v$i")).toDF("id", "v").coalesce(1), path))
      val before = leafNames(path).toSet
      assert(before.nonEmpty)
      GraftTable.appendEvolve(Seq((99, "x")).toDF("id", "v").coalesce(1), path)
      assert(before.subsetOf(leafNames(path).toSet),
        "same-schema evolve must not rewrite leaves")
      assert(GraftTable.read(spark, path).count() === 5L)
    }
  }

  test("diffVersions reads only files unique to either version") {
    val path = tmp()
    val base = Seq.tabulate(800)(i => (i, "v1")).toDF("id", "v")
    GraftTable.writeClustered(base, path, col("id"), 8, statsCols = Seq("id"))
    GraftTable.upsertByKey(spark, path,
      Seq((100, "new"), (101, "new"), (9999, "new")).toDF("id", "v"),
      Seq("id"), statsCols = Seq("id"))
    def runDiff() = GraftTable.diffVersions(spark, path, 1, 2, Seq("id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    val want = Seq((100, "new", "update"), (101, "new", "update"), (9999, "new", "insert"))
    assert(runDiff() === want)
    // the proof: physically delete every data file COMMON to both
    // manifests — the set-difference diff must neither read them nor
    // change its answer (a full-snapshot diff would fail on the read)
    val common = {
      val v2 = GraftTable.filesOf(path, GraftTable.currentManifest(path).get).map(_.path).toSet
      val logDir = new File(path, "_graft_log")
      val v1Manifest = Option(logDir.listFiles).get
        .filter(_.getName == f"v${1L}%020d.json").head
      import org.json4s.jackson.JsonMethods
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      val m = JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(v1Manifest.toPath), "UTF-8"))
        .extract[Manifest]
      GraftTable.filesOf(path, m).map(_.path).toSet intersect v2
    }
    assert(common.nonEmpty, "an upsert touching 1-2 files must leave common files")
    common.foreach(p => assert(new File(path, p).delete()))
    assert(runDiff() === want, "diff after deleting common files must be unchanged")
  }

  private def parseManifestAt(path: String, v: Long): Manifest = {
    import org.json4s.jackson.JsonMethods
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val mf = new File(path + "/_graft_log", f"v$v%020d.json")
    JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")).extract[Manifest]
  }

  private def corruptAllLeaves(path: String): Int = {
    val leafFiles = Option(new File(path, "_graft_log").listFiles).getOrElse(Array.empty[File])
      .filter(_.getName.startsWith("leaf-"))
    leafFiles.foreach(f => Files.write(f.toPath, "NOT JSON".getBytes("UTF-8")))
    leafFiles.length
  }

  test("diffVersions over a logged span parses no leaf manifest and reads no unchanged file") {
    withSmallLimits(inline = 2, maxLeaves = 100) {
      val path = tmp()
      (0 until 6).foreach(i => GraftTable.append(
        Seq.tabulate(10)(j => (i * 1000 + j, "old")).toDF("id", "v").coalesce(1),
        path, statsCols = Seq("id")))
      val fromV = GraftTable.currentVersion(path).get
      GraftTable.upsertByKey(spark, path,
        Seq((3000, "new"), (9999, "new")).toDF("id", "v"), Seq("id"),
        statsCols = Seq("id"))
      GraftTable.append(Seq((10000, "tail")).toDF("id", "v").coalesce(1), path,
        statsCols = Seq("id"))
      val toV = GraftTable.currentVersion(path).get
      def runDiff() = GraftTable.diffVersions(spark, path, fromV, toV, Seq("id"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      val want = Seq((3000, "new", "update"), (9999, "new", "insert"),
        (10000, "tail", "insert"))
      assert(runDiff() === want)
      // the proof the chain is O(changes): corrupt EVERY leaf manifest and
      // delete every data file the span's change logs never mention — the
      // chain diff must neither parse a leaf nor read an unchanged file
      // (the snapshot-diff fallback would die on both)
      val logged: Set[String] = (fromV + 1 to toV).flatMap { v =>
        val ch = parseManifestAt(path, v).changes.get
        (ch.added ++ ch.removed).map(_.path)
      }.toSet
      val dataFiles = Option(new File(path, "data").listFiles).get
        .filter(_.getName.endsWith(".parquet"))
      val untouched = dataFiles.filterNot(f => logged.contains("data/" + f.getName))
      assert(untouched.nonEmpty, "fixture must have unchanged files to delete")
      untouched.foreach(f => assert(f.delete()))
      assert(corruptAllLeaves(path) > 0, "fixture must have leaves to corrupt")
      assert(runDiff() === want,
        "chain diff must survive losing every unchanged file and leaf manifest")
    }
  }

  test("diffVersions insert-only spans skip the join and the from-side read entirely") {
    withSmallLimits(inline = 1, maxLeaves = 3) {
      val path = tmp()
      GraftTable.append(Seq((1, "a")).toDF("id", "v").coalesce(1), path)
      val fromV = GraftTable.currentVersion(path).get
      (2 to 5).foreach(i => GraftTable.append(
        Seq((i, s"v$i")).toDF("id", "v").coalesce(1), path))
      // delete the bookmark-covered file and corrupt every leaf: an
      // append-only chain span must read ONLY the appended files
      val covered = GraftTable.filesOf(path, parseManifestAt(path, fromV)).map(_.path)
      covered.foreach(p => assert(new File(path, p).delete()))
      corruptAllLeaves(path): Unit
      val out = GraftTable.diffVersions(spark, path, fromV,
        GraftTable.currentVersion(path).get, Seq("id"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      assert(out === (2 to 5).map(i => (i, s"v$i", "insert")))
    }
  }

  test("chain-derived diffs equal snapshot-derived diffs over random keyed histories") {
    import org.json4s.jackson.JsonMethods
    import org.json4s.JsonDSL._
    // strip every manifest's change log in a COPY of the table — forcing
    // diffVersions down the snapshot set-difference path — and require
    // bit-identical diff output for random version spans
    def stripLogs(src: String): String = {
      val dst = Files.createTempDirectory("graft_nolog").toString + "/t"
      new File(dst).mkdirs()
      def copyDir(a: File, b: File): Unit = {
        b.mkdirs()
        Option(a.listFiles).getOrElse(Array.empty[File]).foreach { f =>
          if (f.isDirectory) copyDir(f, new File(b, f.getName))
          else Files.copy(f.toPath, new File(b, f.getName).toPath): Unit
        }
      }
      copyDir(new File(src), new File(dst))
      Option(new File(dst, "_graft_log").listFiles).getOrElse(Array.empty[File])
        .filter(_.getName.matches("v\\d{20}\\.json")).foreach { mf =>
        val j = JsonMethods.parse(new String(Files.readAllBytes(mf.toPath), "UTF-8"))
        val stripped = j.removeField { case (n, _) => n == "changes" }
        Files.write(mf.toPath, JsonMethods.compact(JsonMethods.render(stripped))
          .getBytes("UTF-8")): Unit
      }
      dst
    }
    withSmallLimits(inline = 3, maxLeaves = 5) {
      val rnd = new scala.util.Random(7)
      val path = tmp()
      var nextId = 1000
      def rows(ids: Seq[Int], tag: String) = ids.map(i => (i, tag)).toDF("id", "v")
      var live = (0 until 40).toSet
      GraftTable.overwrite(rows(live.toSeq, "base").coalesce(2), path, statsCols = Seq("id"))
      def assertUniqueSnapshot(step: String): Unit = {
        val dups = GraftTable.read(spark, path).groupBy("id")
          .count().filter(col("count") > 1).collect()
        assert(dups.isEmpty,
          s"after $step: duplicate keys in snapshot: ${dups.mkString(", ")}")
      }
      (1 to 12).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => // append strictly-new unique keys
            val fresh = (nextId until nextId + 5); nextId += 5
            GraftTable.append(rows(fresh, s"a$step").coalesce(1), path, statsCols = Seq("id"))
            live ++= fresh
            assertUniqueSnapshot(s"append $step")
          case 1 if live.nonEmpty => // upsert: mix of existing and new keys
            val upd = rnd.shuffle(live.toSeq).take(4) ++ Seq({ val n = nextId; nextId += 1; n })
            live ++= upd
            GraftTable.upsertByKey(spark, path, rows(upd, s"u$step"), Seq("id"),
              statsCols = Seq("id"))
            assertUniqueSnapshot(s"upsert $step of ${upd.sorted}")
          case 2 if live.size > 6 => // keyed delete
            val del = rnd.shuffle(live.toSeq).take(3)
            live --= del
            GraftTable.deleteByKey(spark, path, del.map(Tuple1(_)).toDF("id"), Seq("id"))
            assertUniqueSnapshot(s"delete $step")
          case _ =>
            GraftTable.compactFiles(spark, path, targetBytes = 1L << 20,
              statsCols = Seq("id")): Unit
            assertUniqueSnapshot(s"compact $step")
        }
      }
      val head = GraftTable.currentVersion(path).get
      val stripped = stripLogs(path)
      def canonDiff(p: String, a: Long, b: Long): Seq[(Int, String, String)] =
        GraftTable.diffVersions(spark, p, a, b, Seq("id"))
          .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
          .sortBy(x => (x._1, x._3)).toSeq
      val spans = Seq((1L, head), (head - 1, head)) ++
        (1 to 4).map { _ =>
          val a = 1 + rnd.nextInt(head.toInt - 1); val b = a + 1 + rnd.nextInt(head.toInt - a)
          (a.toLong, b.toLong)
        }
      spans.foreach { case (a, b) =>
        assert(canonDiff(path, a, b) === canonDiff(stripped, a, b),
          s"chain vs snapshot diff diverged on span v$a→v$b")
      }
    }
  }

  test("diffVersions refuses non-unique keys loudly") {
    val path = tmp()
    GraftTable.overwrite(Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "v"), path)
    GraftTable.overwrite(Seq((1, "a"), (2, "d")).toDF("id", "v"), path)
    // the guard now rides the join's own shuffle (assert_true in the
    // presence flag), so it surfaces as a task-time SparkException chain
    val err = intercept[Exception](
      GraftTable.diffVersions(spark, path, 1, 2, Seq("id")).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("not unique")),
      s"expected the dup-key refusal, got: ${messages(err).take(3).mkString(" | ")}")
  }

  test("diffVersions across a widening evolve aligns absent columns as NULL") {
    val path = tmp()
    GraftTable.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    GraftTable.appendEvolve(Seq((3, "c", 9.5)).toDF("id", "v", "score"), path)
    GraftTable.upsertByKey(spark, path,
      Seq((2, "B", 1.5)).toDF("id", "v", "score"), Seq("id"))
    val out = GraftTable.diffVersions(spark, path, 1, 3, Seq("id"))
      .collect().map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(out === Seq((2, "B", Some(1.5), "update"), (3, "c", Some(9.5), "insert")))
    // a non-widening change (drop) refuses
    GraftTable.dropColumn(path, "score")
    val err = intercept[IllegalArgumentException](
      GraftTable.diffVersions(spark, path, 3, 4, Seq("id")).collect())
    assert(err.getMessage.contains("widening"))
  }

  test("syncReplica after a widening evolve applies only the delta") {
    val (src, dst) = (tmp(), tmp())
    GraftTable.overwrite(
      Seq.tabulate(10)(i => (i, s"v$i")).toDF("id", "v").coalesce(2), src)
    GraftTable.syncReplica(spark, src, dst, Seq("id"))
    val bookmark = GraftTable.currentVersion(src).get
    GraftTable.appendEvolve(
      Seq((100, "x", 1.0), (101, "y", 2.0)).toDF("id", "v", "score"), src)
    // the proof: delete every data file the bookmark already covered at
    // the SOURCE — an incremental sync must not read them (a full resync
    // would)
    GraftTable.filesOf(src, parseManifestAt(src, bookmark)).map(_.path)
      .foreach(p => assert(new File(src, p).delete()))
    GraftTable.syncReplica(spark, src, dst, Seq("id"))
    val out = GraftTable.read(spark, dst)
    assert(out.columns.toSeq === Seq("id", "v", "score"))
    val rows = out.collect().map(r => (r.getInt(0),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    assert(rows === (0 until 10).map(i => (i, None)) ++
      Seq((100, Some(1.0)), (101, Some(2.0))))
    // bookmark advanced: an idle re-sync is a no-op commit-wise
    val vBefore = GraftTable.currentVersion(dst).get
    GraftTable.syncReplica(spark, src, dst, Seq("id"))
    assert(GraftTable.currentVersion(dst).get === vBefore)
  }

  test("appendEvolve creates a missing table as a logged append_evolve commit") {
    val path = tmp()
    GraftTable.appendEvolve(Seq((1, "a")).toDF("id", "v"), path)
    assert(GraftTable.versions(path).map(_._3) === Seq("append_evolve"))
    GraftTable.appendEvolve(Seq((2, 1.5)).toDF("id", "score"), path)
    val out = GraftTable.read(spark, path)
    assert(out.columns.toSeq === Seq("id", "v", "score"))
    assert(out.count() === 2L)
  }

  test("point lookups prune at leaf granularity via range stats and union blooms") {
    withSmallLimits(inline = 2, maxLeaves = 100) {
      val path = tmp()
      // hash-layout shape: every append spans nearly the full id range
      // (interleaved even ids), so leaf RANGE stats prune nothing for an
      // in-range probe — only the per-leaf OR-union bloom can
      (0 until 8).foreach { i =>
        GraftTable.append(
          Seq.tabulate(10)(j => (j * 16 + i * 2, s"c$i")).toDF("id", "v").coalesce(1),
          path, statsCols = Seq("id"), bloomCols = Seq("id"))
      }
      // positive probe: present id found, most files skipped
      val hit = GraftTable.readPrunedIn(spark, path, "id", Seq(34))
      assert(hit.df.filter($"id" === 34).count() === 1L)
      assert(hit.filesRead < hit.filesTotal / 2,
        s"blooms must skip most files: read ${hit.filesRead} of ${hit.filesTotal}")
      // negative probe: an odd id inside every range — blooms prove every
      // file AND every leaf clean
      val miss = GraftTable.readPrunedIn(spark, path, "id", Seq(33))
      assert(miss.filesRead === 0, s"expected 0 files, got ${miss.filesRead}")
      // leaf-grain proof: corrupt every leaf body — the negative probe
      // must still plan from leaf aggregate stats alone
      assert(corruptAllLeaves(path) > 0)
      val blind = GraftTable.readPrunedIn(spark, path, "id", Seq(33))
      assert(blind.filesRead === 0 && blind.df.count() === 0L)
    }
  }

  test("racing appenders all land through the rebase loop under forced leaves") {
    withSmallLimits(inline = 1, maxLeaves = 3) {
      val path = tmp()
      GraftTable.overwrite(Seq((0, "base")).toDF("id", "v").coalesce(1), path)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 4).map { t =>
        new Thread(() => {
          try (0 until 3).foreach { i =>
            GraftTable.append(
              Seq((t * 10 + i, s"t$t-$i")).toDF("id", "v").coalesce(1), path)
          } catch { case e: Throwable => failures.add(e): Unit }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(failures.isEmpty, s"appender died: ${Option(failures.peek()).map(_.getMessage)}")
      // every append landed exactly once, versions are gapless, and the
      // loser-written orphan leaves are invisible to every snapshot
      assert(GraftTable.read(spark, path).count() === 13L)
      assert(GraftTable.versions(path).map(_._1) === (1L to 13L))
      (1L to 13L).foreach(v =>
        assert(GraftTable.readVersion(spark, path, v).count() === v))
      GraftTable.vacuum(path, keepVersions = 2)
      assert(GraftTable.read(spark, path).count() === 13L)
    }
  }

  test("readSince tails appends at O(new files) across the leaf layer") {
    withSmallLimits(inline = 1, maxLeaves = 3) {
      val path = tmp()
      GraftTable.append(Seq((1, "a")).toDF("id", "v").coalesce(1), path)
      var mark = GraftTable.currentVersion(path).get
      (2 to 6).foreach(i => GraftTable.append(
        Seq((i, s"v$i")).toDF("id", "v").coalesce(1), path))
      // the consumer loop: everything since the bookmark, then bookmark
      val (tail1, v1) = GraftTable.readSince(spark, path, mark)
      assert(tail1.select("id").collect().map(_.getInt(0)).sorted.toSeq === (2 to 6))
      mark = v1
      // idle poll: nothing new
      val (tail2, v2) = GraftTable.readSince(spark, path, mark)
      assert(tail2.count() === 0L && v2 === mark)
      // the O(new files) proof: delete every data file the bookmark
      // version already covered — the tail read must not touch them
      GraftTable.append(Seq((7, "v7")).toDF("id", "v").coalesce(1), path)
      val covered = {
        import org.json4s.jackson.JsonMethods
        implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
        val mf = new File(path + "/_graft_log", f"v$mark%020d.json")
        val m = JsonMethods.parse(new String(
          java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")).extract[Manifest]
        GraftTable.filesOf(path, m).map(_.path)
      }
      covered.foreach(p => assert(new File(path, p).delete()))
      val (tail3, _) = GraftTable.readSince(spark, path, mark)
      assert(tail3.select("id").collect().map(_.getInt(0)).sorted.toSeq === Seq(7))
    }
  }

  test("history describes every retained commit from manifest metadata alone") {
    withSmallLimits(inline = 1, maxLeaves = 100) {
      val path = tmp()
      (1 to 3).foreach(i => GraftTable.append(
        Seq((i, s"v$i")).toDF("id", "v").coalesce(1), path))
      GraftTable.upsertByKey(spark, path, Seq((2, "new")).toDF("id", "v"), Seq("id"))
      val h = GraftTable.history(spark, path).collect()
      assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
      assert(h.map(_.getString(2)).toSeq === Seq("append", "append", "append", "upsert"))
      assert(h.map(r => r.getLong(4)).toSeq === Seq(1L, 2L, 3L, 3L)) // row counts per version
      // commit timestamps strictly increase (the readAsOf contract)
      assert(h.map(_.getLong(1)).sliding(2).forall(p => p(0) < p(1)))
      // leaf bodies must not be needed: corrupt them, history still works
      GraftTable.currentManifest(path).get.leaves.getOrElse(Nil).foreach { l =>
        java.nio.file.Files.write(new File(path + "/_graft_log", l.path).toPath,
          "NOT JSON".getBytes("UTF-8"))
      }
      assert(GraftTable.history(spark, path).count() === 4L)
    }
  }

  test("planning 10^4 file entries reads only the intersecting leaf") {
    val path = tmp()
    new File(path, "_graft_log").mkdirs()
    // one REAL one-file chunk (the probe target)...
    val realDir = tmp()
    GraftTable.overwrite(
      Seq.tabulate(5)(j => (0 + j, "real")).toDF("id", "v").coalesce(1),
      realDir, statsCols = Seq("id"))
    val realEntry = GraftTable.currentManifest(realDir).get.files.head
    new File(path, "data").mkdirs()
    Files.copy(new File(realDir, realEntry.path).toPath,
      new File(path, realEntry.path).toPath)
    val realLeaf = GraftTable.writeLeaf(path, Seq(realEntry))
    // ...plus 99 leaves of 100 SYNTHETIC entries each, disjoint id ranges,
    // pointing at files that don't exist — planning must never look
    val fakeLeaves = (1 to 99).map { i =>
      GraftTable.writeLeaf(path, Seq.tabulate(100) { j =>
        val lo = i * 10000 + j * 10
        FileEntry(s"data/fake-$i-$j.parquet", 10, 1000,
          Map("id" -> ColStats("long", Some(lo.toString), Some((lo + 9).toString), 0)))
      })
    }
    val schemaDdl = GraftTable.currentManifest(realDir).get.schemaDdl
    assert(GraftTable.tryCommit(path, Manifest(1L, 1L, "synthetic", schemaDdl,
      Nil, None, Some(realLeaf +: fakeLeaves))))
    val t0 = System.nanoTime()
    val scan = GraftTable.readPruned(spark, path, Seq(ColRange("id", Some(0), Some(9))))
    val planMs = (System.nanoTime() - t0) / 1e6
    assert(scan.filesTotal === 9901, s"expected 9901 entries, got ${scan.filesTotal}")
    assert(scan.filesRead === 1, s"expected 1 file kept, got ${scan.filesRead}")
    assert(scan.df.count() === 5L)
    // not a perf assertion per se, but sub-linearity shows up as planning
    // far under parse-everything cost; keep a generous sanity ceiling
    assert(planMs < 5000, s"planning took ${planMs}ms for 10^4 entries")
    info(f"planned 9901 entries in $planMs%.1f ms, parsed 1 of 100 leaves")
  }
}
