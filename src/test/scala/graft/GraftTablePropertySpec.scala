package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftTable

/** Model-based property test: a seeded random sequence of table
  * operations (overwrite / append / upsert / compact / stream-append with
  * occasional verbatim replays) runs against both the real GraftTable and
  * a driver-side model (a Map snapshot per version). Invariants after
  * EVERY op:
  *  - the live table equals the model's latest snapshot;
  *  - every historical version still reads back as its model snapshot
  *    (time travel is never corrupted by later ops);
  *  - vacuum never changes any retained snapshot's contents.
  * The q11-style equivalence argument, generalized to the whole format. */
class GraftTablePropertySpec extends AnyFunSuite with SparkSpecBase {

  private def kvDf(m: Map[Int, String]) =
    if (m.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING"))
    else df("k INT, v STRING", m.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(Int.box(k), v) }: _*)

  private def readBack(path: String, version: Long): Map[Int, String] =
    GraftTable.readVersion(spark, path, version).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  test("random op sequences preserve every snapshot (seeded, 3 runs × 24 ops)") {
    for (seed <- Seq(7, 21, 63)) randomOpRun(seed)
  }

  test("random op sequences hold under forced leaf manifests") {
    // shrink the spill/merge thresholds so every commit exercises the
    // two-level manifest machinery (leaf spill, pointer carry, tiered
    // merge, leaf vacuum) under the same arbitrary op interleavings
    val (si, sm) = (GraftTable.InlineFileLimit, GraftTable.MaxLeaves)
    GraftTable.InlineFileLimit = 2
    GraftTable.MaxLeaves = 3
    try for (seed <- Seq(11, 42)) randomOpRun(seed)
    finally { GraftTable.InlineFileLimit = si; GraftTable.MaxLeaves = sm }
  }

  private def randomOpRun(seed: Int): Unit = {
    {
      val rnd = new scala.util.Random(seed)
      val path = java.nio.file.Files.createTempDirectory(s"graft_vtp$seed").toString + "/t"
      // model: version -> full contents; multiset because append can
      // duplicate keys — model values are Seq per key
      var multi = Map.empty[Int, List[String]] // current contents as key -> values
      val history = scala.collection.mutable.ArrayBuffer.empty[Map[Int, List[String]]]
      def liveRows(path: String): Map[Int, List[String]] =
        GraftTable.read(spark, path).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
      def kvRows(m: Seq[(Int, String)]) =
        if (m.isEmpty) kvDf(Map.empty)
        else df("k INT, v STRING", m.map { case (k, v) => Row(Int.box(k), v) }: _*)
      var streamBatch = 0L
      for (step <- 0 until 24) {
        val fresh = (0 until rnd.nextInt(4) + 1)
          .map(_ => (rnd.nextInt(12), s"s$seed-$step-${rnd.nextInt(100)}"))
        rnd.nextInt(16) match {
          case 0 =>
            GraftTable.overwrite(kvRows(fresh), path)
            multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
          case 1 | 2 =>
            if (GraftTable.exists(path)) {
              GraftTable.append(kvRows(fresh), path)
              multi = fresh.foldLeft(multi) { case (m, (k, v)) =>
                m + (k -> (v :: m.getOrElse(k, Nil)).sorted)
              }
            } else {
              GraftTable.overwrite(kvRows(fresh), path)
              multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
            }
          case 3 =>
            // keyed upsert: delta must be key-unique (replace semantics)
            val delta = fresh.toMap.toSeq
            GraftTable.upsertByKey(spark, path, kvRows(delta), Seq("k"))
            multi = delta.foldLeft(multi) { case (m, (k, v)) => m + (k -> List(v)) }
          case 4 =>
            // compact (sometimes WINDOWED on a random k range): contents
            // must not change; may be a version no-op (≤1 small file in
            // the window) — the history loop below records either way
            if (GraftTable.exists(path)) {
              val window = if (rnd.nextBoolean()) Nil
                else Seq(GraftTable.ColRange("k", Some(rnd.nextInt(8)), None))
              GraftTable.compactFiles(spark, path, targetBytes = 1L << 20,
                where = window): Unit
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 5 =>
            if (GraftTable.exists(path)) {
              val replay = rnd.nextBoolean() && streamBatch > 0
              val id = if (replay) streamBatch - 1 else streamBatch
              val v = GraftTable.appendStream(kvRows(fresh), path, "s", id)
              if (!replay) {
                streamBatch += 1
                multi = fresh.foldLeft(multi) { case (m, (k, v2)) =>
                  m + (k -> (v2 :: m.getOrElse(k, Nil)).sorted)
                }
              } else assert(v == -1L, "replayed stream batch must be a no-op")
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 6 =>
            // predicate delete: drop every row with k >= cutoff (may be a
            // no-match; the commit still lands and the model snapshots it)
            if (GraftTable.exists(path)) {
              val cutoff = rnd.nextInt(14)
              GraftTable.deleteWhere(spark, path, col("k") >= cutoff): Unit
              multi = multi.filter { case (k, _) => k < cutoff }
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 7 =>
            // predicate update: every row of one key takes a new value
            if (GraftTable.exists(path)) {
              val (target, nv) = (rnd.nextInt(12), s"u$seed-$step")
              GraftTable.updateWhere(spark, path, col("k") === target,
                Map("v" -> org.apache.spark.sql.functions.lit(nv))): Unit
              multi = multi.map { case (k, vs) =>
                k -> (if (k == target) vs.map(_ => nv) else vs)
              }
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 8 =>
            // restore: roll content back to a random retained version
            // (self-restore is a version no-op — the history loop records
            // either way); marks stay monotone so later stream replays
            // still no-op
            if (GraftTable.exists(path)) {
              val cur = GraftTable.currentVersion(path).get
              val target = 1L + rnd.nextInt(cur.toInt)
              GraftTable.restore(path, target): Unit
              if (target != cur) multi = history(target.toInt - 1)
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 9 =>
            // conditional MERGE: matched high keys delete, other matched
            // rows take the source value (every row of a duplicated key),
            // unmatched source rows insert
            if (GraftTable.exists(path)) {
              val delta = fresh.toMap.toSeq // source must be key-unique
              // COW and MOR merges share one model — semantics must be
              // identical, only the commit's cost shape differs
              val doMerge =
                if (rnd.nextBoolean()) GraftTable.mergeInto(spark, path, kvRows(delta),
                  Seq("k"), updateSet = Map("v" -> GraftTable.srcCol("v")),
                  deleteWhen = Some(GraftTable.srcCol("k") >= 9))
                else GraftTable.mergeIntoMor(spark, path, kvRows(delta),
                  Seq("k"), updateSet = Map("v" -> GraftTable.srcCol("v")),
                  deleteWhen = Some(GraftTable.srcCol("k") >= 9))
              doMerge: Unit
              multi = delta.foldLeft(multi) { case (m, (k, v)) =>
                if (m.contains(k)) {
                  if (k >= 9) m - k else m + (k -> m(k).map(_ => v))
                } else m + (k -> List(v)) // not matched -> insert (any k)
              }
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 10 =>
            // ANALYZE backfill: metadata-only, contents invariant; a
            // fully-covered table makes it a version no-op
            if (GraftTable.exists(path)) {
              GraftTable.analyzeStats(spark, path, Seq("v"),
                bloomCols = if (rnd.nextBoolean()) Seq("k") else Nil): Unit
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 11 =>
            // merge-on-read delete: same model as predicate delete, a
            // vector-swap commit instead of a rewrite — interleaves with
            // every COW op, restore, compaction, and vacuum below
            if (GraftTable.exists(path)) {
              val target = rnd.nextInt(14)
              GraftTable.deleteWhereMor(spark, path, col("k") === target): Unit
              multi = multi - target
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 12 =>
            // purge: fold every vector into a rewrite — contents
            // invariant; vector-free tables make it a version no-op
            if (GraftTable.exists(path)) {
              GraftTable.purgeDeletes(spark, path): Unit
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 13 =>
            // merge-on-read update: case 7's model (every row of one key
            // takes a new value) via vector-mask + image append
            if (GraftTable.exists(path)) {
              val (target, nv) = (rnd.nextInt(12), s"mu$seed-$step")
              GraftTable.updateWhereMor(spark, path, col("k") === target,
                Map("v" -> org.apache.spark.sql.functions.lit(nv))): Unit
              multi = multi.map { case (k, vs) =>
                k -> (if (k == target) vs.map(_ => nv) else vs)
              }
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 14 =>
            // dynamic overwrite: every row in a key window swaps for a
            // fresh batch wholly inside the window (possibly duplicate
            // keys — replace is not an upsert). COW full-cover drops and
            // MOR vector masks share ONE model: only cost shapes differ.
            if (GraftTable.exists(path)) {
              val lo = rnd.nextInt(10); val hi = lo + rnd.nextInt(4)
              val repl = fresh.map { case (k, v) => (lo + k % (hi - lo + 1), v) }
              val doRw =
                if (rnd.nextBoolean()) GraftTable.overwriteWhere(spark, path,
                  kvRows(repl), col("k").between(lo, hi))
                else GraftTable.overwriteWhereMor(spark, path,
                  kvRows(repl), col("k").between(lo, hi))
              doRw: Unit
              multi = multi.filter { case (k, _) => k < lo || k > hi } ++
                repl.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 15 =>
            // metadata-only truncate: the model goes empty in one commit
            if (GraftTable.exists(path)) {
              GraftTable.truncate(path): Unit
              multi = Map.empty
            }
          case _ => ()
        }
        // history tracking: one snapshot per committed version
        while (history.size < GraftTable.currentVersion(path).get.toInt) history += multi
        assert(liveRows(path) == multi, s"seed=$seed step=$step live mismatch")
      }
      // every retained version equals its recorded model snapshot
      val versions = GraftTable.versions(path).map(_._1)
      assert(versions.size == history.size, s"seed=$seed: ${versions.size} vs ${history.size}")
      versions.foreach { v =>
        val got = GraftTable.readVersion(spark, path, v).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
        assert(got == history(v.toInt - 1), s"seed=$seed version $v drifted")
      }
      // vacuum to the last 3 versions: retained snapshots unchanged
      GraftTable.vacuum(path, keepVersions = 3)
      val retained = GraftTable.versions(path).map(_._1)
      assert(retained.size <= 3)
      retained.foreach { v =>
        val got = GraftTable.readVersion(spark, path, v).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
        assert(got == history(v.toInt - 1), s"seed=$seed version $v broken by vacuum")
      }
    }
  }

  test("racing ANALYZE and append writers: coverage converges, history stays intact") {
    val path = java.nio.file.Files.createTempDirectory("graft_race_an").toString + "/t"
    // v deliberately unindexed: the analyzer backfills while the
    // appender keeps landing new unindexed files
    GraftTable.overwrite(kvDf(Map(0 -> "init")), path, statsCols = Seq("k"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tAppend = new Thread(() => {
      try (1 to 8).foreach(i =>
        GraftTable.append(kvDf(Map(100 + i -> s"a$i")), path, statsCols = Seq("k")))
      catch { case e: Throwable => failures.add(e): Unit }
    })
    val tAnalyze = new Thread(() => {
      try (0 until 8).foreach { _ =>
        GraftTable.analyzeStats(spark, path, Seq("v")): Unit
        Thread.sleep(3)
      } catch { case e: Throwable => failures.add(e): Unit }
    })
    tAppend.start(); tAnalyze.start()
    tAppend.join(); tAnalyze.join()
    assert(failures.isEmpty, s"racer died: ${Option(failures.peek()).map(_.toString)}")
    // one final analyze covers whatever the last appends left; a second
    // is a no-op (the convergence contract under contention)
    val v = GraftTable.analyzeStats(spark, path, Seq("v"))
    assert(GraftTable.analyzeStats(spark, path, Seq("v")) == v)
    val cov = GraftTable.describeStats(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(5))).toMap
    assert(cov("v")._1 == cov("v")._2, s"v coverage ${cov("v")}")
    // no row lost, no version corrupted, history gapless
    assert(GraftTable.read(spark, path).count() == 9)
    val head = GraftTable.currentVersion(path).get
    assert(GraftTable.versions(path).map(_._1) == (1L to head))
    (1L to head).foreach(v => GraftTable.readVersion(spark, path, v).count())
  }

  /** Racing writers over the round-8 DML ops: one thread issues keyed
    * MERGEs (retrying lost races — the documented caller contract), the
    * other interleaves appends and RESTOREs (whose internal rebase loops
    * absorb races). Because every commit is put-if-absent at
    * parent+1, a SUCCESSFUL commit's parent is exactly the snapshot the
    * op computed from — so each landed version re-verifies against its
    * parent through the op's own model, with no global interleaving
    * model needed. Gapless versions + per-op exactness = no commit
    * lost, none double-applied, under real thread interleavings. */
  test("racing merge/restore/append writers: every landed version verifies against its parent") {
    for (seed <- Seq(5, 17)) {
      val path = java.nio.file.Files.createTempDirectory(s"graft_race$seed").toString + "/t"
      def kvRows(m: Seq[(Int, String)]) =
        if (m.isEmpty) kvDf(Map.empty)
        else df("k INT, v STRING", m.map { case (k, v) => Row(Int.box(k), v) }: _*)
      GraftTable.overwrite(kvRows((0 until 6).map(k => k -> s"init$k")), path) // v1
      case class OpRec(version: Long, kind: String, payload: Any)
      val recs = new java.util.concurrent.ConcurrentLinkedQueue[OpRec]()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def retrying(body: => Long): Long = {
        var out = -1L
        var n = 0
        var done = false
        while (!done) {
          try { out = body; done = true }
          catch {
            case _: java.util.ConcurrentModificationException if n < 100 => n += 1
          }
        }
        out
      }
      val tMerge = new Thread(() => {
        val rnd = new scala.util.Random(seed)
        try (0 until 5).foreach { i =>
          val delta = (0 until rnd.nextInt(3) + 1)
            .map(_ => (rnd.nextInt(12), s"m$seed-$i-${rnd.nextInt(100)}")).toMap.toSeq
          val v = retrying(GraftTable.mergeInto(spark, path, kvRows(delta), Seq("k"),
            updateSet = Map("v" -> GraftTable.srcCol("v")),
            deleteWhen = Some(GraftTable.srcCol("k") >= 9)))
          recs.add(OpRec(v, "merge", delta)): Unit
        } catch { case e: Throwable => failures.add(e): Unit }
      })
      val tOther = new Thread(() => {
        val rnd = new scala.util.Random(seed + 1000)
        try (0 until 5).foreach { i =>
          if (rnd.nextBoolean()) {
            val rows = Seq((20 + rnd.nextInt(5), s"a$seed-$i"))
            val v = retrying(GraftTable.append(kvRows(rows), path))
            recs.add(OpRec(v, "append", rows)): Unit
          } else {
            val target = 1L + rnd.nextInt(GraftTable.currentVersion(path).get.toInt)
            val v = retrying(GraftTable.restore(path, target))
            recs.add(OpRec(v, "restore", target)): Unit
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      })
      tMerge.start(); tOther.start()
      tMerge.join(); tOther.join()
      assert(failures.isEmpty,
        s"seed=$seed writer died: ${Option(failures.peek()).map(_.toString)}")
      import scala.jdk.CollectionConverters._
      val ops = recs.asScala.toSeq
      // every non-self-restore op committed exactly one version; gapless
      val selfRestores = ops.count {
        case OpRec(v, "restore", t: Long) => v == t
        case _ => false
      }
      val head = GraftTable.currentVersion(path).get
      assert(head == 1L + ops.size - selfRestores,
        s"seed=$seed: head $head vs ${ops.size} ops ($selfRestores self-restores)")
      assert(GraftTable.versions(path).map(_._1) == (1L to head))
      def contents(v: Long): Map[Int, List[String]] =
        GraftTable.readVersion(spark, path, v).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
      ops.foreach {
        case OpRec(v, "merge", delta: Seq[(Int, String)] @unchecked) =>
          val parent = contents(v - 1)
          val expect = delta.foldLeft(parent) { case (m, (k, value)) =>
            if (m.contains(k)) { if (k >= 9) m - k else m + (k -> m(k).map(_ => value)) }
            else m + (k -> List(value))
          }
          assert(contents(v) == expect, s"seed=$seed merge v$v diverged from parent model")
        case OpRec(v, "append", rows: Seq[(Int, String)] @unchecked) =>
          val expect = rows.foldLeft(contents(v - 1)) { case (m, (k, value)) =>
            m + (k -> (value :: m.getOrElse(k, Nil)).sorted)
          }
          assert(contents(v) == expect, s"seed=$seed append v$v diverged from parent model")
        case OpRec(v, "restore", target: Long) =>
          assert(contents(v) == contents(target),
            s"seed=$seed restore v$v != its target v$target")
        case other => fail(s"unexpected record $other")
      }
    }
  }

  test("racing MOR merge and purge writers: masks, images, and folds all verify") {
    for (seed <- Seq(7, 23)) {
      val path = java.nio.file.Files.createTempDirectory(s"graft_morrace$seed").toString + "/t"
      def kvRows(m: Seq[(Int, String)]) =
        if (m.isEmpty) kvDf(Map.empty)
        else df("k INT, v STRING", m.map { case (k, v) => Row(Int.box(k), v) }: _*)
      GraftTable.overwrite(kvRows((0 until 8).map(k => k -> s"init$k")), path) // v1
      case class OpRec(version: Long, kind: String, payload: Any)
      val recs = new java.util.concurrent.ConcurrentLinkedQueue[OpRec]()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def retrying[A](body: => A): A = {
        var out: Option[A] = None
        var n = 0
        while (out.isEmpty) {
          try out = Some(body)
          catch { case _: java.util.ConcurrentModificationException if n < 100 => n += 1 }
        }
        out.get
      }
      val tMerge = new Thread(() => {
        val rnd = new scala.util.Random(seed)
        try (0 until 5).foreach { i =>
          val delta = (0 until rnd.nextInt(3) + 1)
            .map(_ => (rnd.nextInt(12), s"m$seed-$i-${rnd.nextInt(100)}")).toMap.toSeq
          val v = retrying(GraftTable.mergeIntoMor(spark, path, kvRows(delta), Seq("k"),
            updateSet = Map("v" -> GraftTable.srcCol("v")),
            deleteWhen = Some(GraftTable.srcCol("k") >= 9)))
          recs.add(OpRec(v, "merge", delta)): Unit
        } catch { case e: Throwable => failures.add(e): Unit }
      })
      val tPurge = new Thread(() => {
        try (0 until 5).foreach { _ =>
          val (touched, v) = retrying(GraftTable.purgeDeletes(spark, path))
          if (touched > 0) recs.add(OpRec(v, "purge", touched)): Unit
          Thread.sleep(30)
        } catch { case e: Throwable => failures.add(e): Unit }
      })
      tMerge.start(); tPurge.start()
      tMerge.join(); tPurge.join()
      assert(failures.isEmpty,
        s"seed=$seed writer died: ${Option(failures.peek()).map(_.toString)}")
      import scala.jdk.CollectionConverters._
      def contents(v: Long): Map[Int, List[String]] =
        GraftTable.readVersion(spark, path, v).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
      recs.asScala.toSeq.foreach {
        case OpRec(v, "merge", delta: Seq[(Int, String)] @unchecked) =>
          val parent = contents(v - 1)
          val expect = delta.foldLeft(parent) { case (m, (k, value)) =>
            if (m.contains(k)) { if (k >= 9) m - k else m + (k -> m(k).map(_ => value)) }
            else m + (k -> List(value))
          }
          assert(contents(v) == expect, s"seed=$seed MOR merge v$v diverged from parent")
        case OpRec(v, "purge", _) =>
          assert(contents(v) == contents(v - 1),
            s"seed=$seed purge v$v changed contents")
          assert(GraftTable.filesOf(path, GraftTable.manifestAt(path, v))
            .forall(_.dv.isEmpty), s"seed=$seed purge v$v left vectors")
        case other => fail(s"unexpected record $other")
      }
      // the final head still reads clean after the dust settles
      assert(contents(GraftTable.currentVersion(path).get).values.flatten.nonEmpty)
    }
  }

  /** SURVEY S6: the reference stages dims as `FROM src AT (TIMESTAMP =>
    * t) WHERE dl_process_date > hwm` (stg_dim_customer.sql:71-72); the
    * production rebuild reads CURRENT state windowed `hwm_prev < pd <=
    * hwm_at_t`. With real snapshots the equivalence is now executable,
    * not argued: under the CDC load discipline (process dates strictly
    * increase across loads — they are load timestamps), every
    * (earlier, later) version pair agrees exactly. */
  test("S6 executable equivalence: AT(ts)+HWM filter == current-state HWM window") {
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val path = java.nio.file.Files.createTempDirectory(s"graft_tt$seed").toString + "/cdc"
      var maxPd = 0L
      val hwms = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (b <- 0 until 5) {
        val base = maxPd + rnd.nextInt(3) + 1 // strictly after every prior load
        val rows = (0 until rnd.nextInt(4) + 1).map { i =>
          Row(Long.box(rnd.nextInt(8)), s"b$b-$i", Long.box(base + rnd.nextInt(2)))
        }
        maxPd = rows.map(_.getLong(2)).max
        GraftTable.append(df("id BIGINT, payload STRING, pd BIGINT", rows: _*), path)
        hwms += maxPd
      }
      val vs = GraftTable.versions(path)
      val cur = GraftTable.read(spark, path)
      for (i <- vs.indices; j <- (i + 1) until vs.size) {
        val atRead = GraftTable.readAsOf(spark, path, vs(j)._2)
          .filter(col("pd") > hwms(i))
        val batchRead = cur.filter(col("pd") > hwms(i) && col("pd") <= hwms(j))
        assert(canon(atRead) == canon(batchRead), s"seed=$seed pair ($i,$j) diverged")
      }
    }
  }

  test("S6 equivalence precondition: a late row behind the snapshot HWM breaks it") {
    val path = java.nio.file.Files.createTempDirectory("graft_ttlate").toString + "/cdc"
    def one(id: Long, v: String, pd: Long) =
      df("id BIGINT, payload STRING, pd BIGINT", Row(Long.box(id), v, Long.box(pd)))
    GraftTable.append(one(1L, "a", 10L), path)    // v1, hwm 10
    GraftTable.append(one(2L, "b", 20L), path)    // v2, hwm 20
    GraftTable.append(one(3L, "late", 15L), path) // v3 VIOLATES monotone loads
    val ts2 = GraftTable.versions(path)(1)._2
    val atRead = GraftTable.readAsOf(spark, path, ts2).filter(col("pd") > 10L)
    val batchRead = GraftTable.read(spark, path)
      .filter(col("pd") > 10L && col("pd") <= 20L)
    // the snapshot read cannot see the late row; the windowed batch read
    // does — which is exactly why the CDC feed stamps pd at load time
    assert(canon(atRead) != canon(batchRead))
    assert(canon(batchRead).size == canon(atRead).size + 1)
  }
}
