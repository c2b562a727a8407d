package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.core.GraftTable
import graft.catalog.GraftCatalog

/** Stock-session row-level SQL on catalog names through
  * [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]]:
  * Spark's own rewrite rules plan the group-based protocol against
  * [[graft.catalog.GraftGroupOperation]] — no extension parser
  * involved (this session has none). */
class GraftRowLevelSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft_rowlevel").toString

  spark.conf.set("spark.sql.catalog.grl", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.grl.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS grl.ns")

  test("stock UPDATE rewrites only the stats-pruned files") {
    val path = s"$warehouse/ns/upd"
    GraftTable.writeClustered(spark.range(0, 4000)
      .selectExpr("cast(id as int) AS k", "cast(id as string) AS v"),
      path, col("k"), numFiles = 8, statsCols = Seq("k"))
    val before = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .map(_.path).toSet
    spark.sql("UPDATE grl.ns.upd SET v = 'hit' WHERE k >= 3500")
    val t = spark.table("grl.ns.upd")
    assert(t.count() == 4000)
    assert(t.filter(col("v") === "hit").count() == 500)
    assert(t.filter(col("k") < 3500 && col("v") === "hit").count() == 0)
    assert(canon(t.filter(col("k") === 100).select("v")) == canon(Seq("100").toDF("v")))
    // the pushed condition pruned: most pre-update files carry forward
    val after = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .map(_.path).toSet
    val carried = (before intersect after).size
    assert(carried >= 6, s"expected most of 8 clustered files untouched, carried $carried")
  }

  test("stock UPDATE with an IN-subquery condition (never V1-translatable)") {
    val path = s"$warehouse/ns/updsub"
    GraftTable.overwrite(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), path)
    Seq(1, 3).toDF("kk").createOrReplaceTempView("rl_keys")
    spark.sql("UPDATE grl.ns.updsub SET v = concat(v, '!') " +
      "WHERE k IN (SELECT kk FROM rl_keys)")
    assert(canon(spark.table("grl.ns.updsub")) ==
      canon(Seq((1, "a!"), (2, "b"), (3, "c!")).toDF("k", "v")))
  }

  test("stock MERGE INTO: matched update + not-matched insert") {
    val path = s"$warehouse/ns/mrg"
    GraftTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    Seq((2, "B"), (9, "Z")).toDF("k", "v").createOrReplaceTempView("rl_src")
    spark.sql("""MERGE INTO grl.ns.mrg t USING rl_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(canon(spark.table("grl.ns.mrg")) ==
      canon(Seq((1, "a"), (2, "B"), (9, "Z")).toDF("k", "v")))
  }

  test("stock MERGE with not-matched-by-source delete") {
    val path = s"$warehouse/ns/mrg2"
    GraftTable.overwrite(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), path)
    Seq((2, "B")).toDF("k", "v").createOrReplaceTempView("rl_src2")
    spark.sql("""MERGE INTO grl.ns.mrg2 t USING rl_src2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(canon(spark.table("grl.ns.mrg2")) == canon(Seq((2, "B")).toDF("k", "v")))
  }

  test("complex DELETE (subquery) falls through deleteWhere to the row-level path") {
    val path = s"$warehouse/ns/delsub"
    GraftTable.overwrite(Seq.tabulate(10)(i => (i, s"v$i")).toDF("k", "v"), path)
    Seq(0, 2, 4).toDF("kk").createOrReplaceTempView("rl_del")
    spark.sql("DELETE FROM grl.ns.delsub WHERE k IN (SELECT kk FROM rl_del)")
    assert(spark.table("grl.ns.delsub").count() == 7)
    assert(spark.table("grl.ns.delsub").filter(col("k").isin(0, 2, 4)).count() == 0)
  }

  test("UPDATE on a MOR snapshot reads live rows only; rewritten files shed their vectors") {
    val path = s"$warehouse/ns/updmor"
    GraftTable.overwrite(spark.range(0, 100)
      .selectExpr("cast(id as int) AS k", "cast(id as string) AS v"), path)
    GraftTable.deleteWhereMor(spark, path, col("k") < 10)
    spark.sql("UPDATE grl.ns.updmor SET v = 'x' WHERE k >= 0")
    val t = spark.table("grl.ns.updmor")
    assert(t.count() == 90) // the dv'd rows stayed dead through the rewrite
    assert(t.filter(col("v") =!= "x").count() == 0)
    assert(GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .forall(_.dv.isEmpty))
  }

  test("MOR tables route stock row-level SQL through the DELTA protocol: O(changed rows)") {
    val path = s"$warehouse/ns/delta"
    GraftTable.writeClustered(spark.range(0, 4000)
      .selectExpr("cast(id as int) AS k", "cast(id as string) AS v"),
      path, col("k"), numFiles = 8, statsCols = Seq("k"))
    GraftTable.setProperties(path, Map("graft.deletionVectors" -> "true"))
    val before = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .map(_.path).toSet
    spark.sql("UPDATE grl.ns.delta SET v = 'hit' WHERE k >= 3900")
    val m = GraftTable.currentManifest(path).get
    assert(m.op == "update_rowlevel_mor", m.op)
    val after = GraftTable.filesOf(path, m)
    // merge-on-read: every pre-update data file survives BY POINTER
    // (the touched one re-listed with a vector), plus the small insert
    assert(before.subsetOf(after.map(_.path).toSet),
      s"MOR update must not rewrite data files")
    assert(after.count(_.dv.isDefined) >= 1)
    val t = spark.table("grl.ns.delta")
    assert(t.count() == 4000)
    assert(t.filter(col("v") === "hit").count() == 100)
    assert(t.filter(col("k") < 3900 && col("v") === "hit").count() == 0)
  }

  test("MOR DELETE with a subquery: positions only, no data staged") {
    val path = s"$warehouse/ns/deltadel"
    GraftTable.overwrite(spark.range(0, 100)
      .selectExpr("cast(id as int) AS k", "cast(id as string) AS v"), path)
    GraftTable.setProperties(path, Map("graft.deletionVectors" -> "true"))
    Seq(3, 5, 7).toDF("kk").createOrReplaceTempView("rl_mor_del")
    spark.sql("DELETE FROM grl.ns.deltadel WHERE k IN (SELECT kk FROM rl_mor_del)")
    val m = GraftTable.currentManifest(path).get
    assert(m.op == "delete_rowlevel_mor", m.op)
    assert(spark.table("grl.ns.deltadel").count() == 97)
    assert(GraftTable.filesOf(path, m).exists(_.dv.exists(_.rows == 3)))
  }

  test("MOR MERGE: vectors mask the changed rows, inserts append") {
    val path = s"$warehouse/ns/deltamrg"
    GraftTable.overwrite(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), path)
    GraftTable.setProperties(path, Map("graft.deletionVectors" -> "true"))
    Seq((2, "B"), (9, "Z")).toDF("k", "v").createOrReplaceTempView("rl_mor_src")
    spark.sql("""MERGE INTO grl.ns.deltamrg t USING rl_mor_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(canon(spark.table("grl.ns.deltamrg")) ==
      canon(Seq((1, "a"), (2, "B"), (3, "c"), (9, "Z")).toDF("k", "v")))
    assert(GraftTable.currentManifest(path).get.op == "merge_rowlevel_mor")
  }

  test("delta commit refuses when a touched file was re-vectored concurrently") {
    val path = s"$warehouse/ns/deltarace"
    GraftTable.overwrite(spark.range(0, 50)
      .selectExpr("cast(id as int) AS k", "cast(id as string) AS v"), path)
    GraftTable.setProperties(path, Map("graft.deletionVectors" -> "true"))
    val pinned = GraftTable.currentManifest(path).get
    // stage a position delete against the PINNED snapshot …
    val stage = java.nio.file.Files.createTempDirectory("grl_race").toFile
    val fe = GraftTable.filesOf(path, pinned).head
    val uri = new org.apache.hadoop.fs.Path(
      new java.io.File(path, fe.path).toURI).toString
    import org.apache.spark.sql.types._
    val posDf = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(uri, 0L)),
      StructType(Seq(StructField("f", StringType, false), StructField("p", LongType, false))))
    val posFile = new java.io.File(stage, "del.parquet")
    posDf.coalesce(1).write.mode("overwrite").parquet(stage.toString + "/out")
    val part = new java.io.File(stage.toString + "/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    // … then a concurrent MOR delete re-vectors the same file
    GraftTable.deleteWhereMor(spark, path, col("k") === 5)
    intercept[java.util.ConcurrentModificationException](
      GraftTable.applyDeltaCommit(spark, path, pinned, Seq(part), Nil,
        StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))),
        "delete_rowlevel_mor"))
    // a refused statement reclaims everything it placed: the staged
    // position part and the executor-written merged dv sidecar — the dv
    // dir holds exactly the vectors the live manifest references
    assert(!part.exists(), "refused delta commit must delete staged position parts")
    val live = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .flatMap(_.dv).map(d => new java.io.File(d.path).getName).toSet
    val onDisk = Option(new java.io.File(path, "_dv").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(onDisk == live, s"orphan dv sidecars after refusal: ${onDisk diff live}")
  }

  test("group commit refuses when a scanned file was re-vectored concurrently (COW vs DV swap)") {
    val path = s"$warehouse/ns/cowrace"
    GraftTable.overwrite(spark.range(0, 50)
      .selectExpr("cast(id as int) AS k", "cast(id as string) AS v"), path)
    // group protocol (no graft.deletionVectors) — but deleteWhereMor is a
    // public API not gated on the property, so dv swaps DO land on
    // group-protocol tables; a stale COW replace would resurrect k=5
    GraftTable.betweenStageAndCommitForTests = () => {
      GraftTable.betweenStageAndCommitForTests = () => ()
      GraftTable.deleteWhereMor(spark, path, col("k") === 5)
    }
    try {
      val e = intercept[Exception](
        spark.sql("UPDATE grl.ns.cowrace SET v = 'x' WHERE k >= 0"))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("re-vectored")), e.toString)
    } finally GraftTable.betweenStageAndCommitForTests = () => ()
    assert(spark.table("grl.ns.cowrace").count() == 49)
    assert(spark.table("grl.ns.cowrace").filter(col("k") === 5).count() == 0)
    assert(spark.table("grl.ns.cowrace").filter(col("v") === "x").count() == 0)
  }

  test("runtime group filtering: an un-stats-prunable UPDATE rewrites only true-match files") {
    val path = s"$warehouse/ns/rgf"
    // stats ONLY on k: the condition on v is invisible to the static
    // prune — without runtime group filtering every file rewrites
    GraftTable.writeClustered(spark.range(0, 4000)
      .selectExpr("cast(id as int) AS k", "cast(id as string) AS v"),
      path, col("k"), numFiles = 8, statsCols = Seq("k"))
    val before = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .map(_.path).toSet
    assert(before.size == 8)
    spark.sql("UPDATE grl.ns.rgf SET v = 'hit' WHERE v = '3777'")
    val after = GraftTable.filesOf(path, GraftTable.currentManifest(path).get)
      .map(_.path).toSet
    val carried = (before intersect after).size
    assert(carried >= 7,
      s"runtime group filter should keep 7/8 files untouched, carried $carried")
    val t = spark.table("grl.ns.rgf")
    assert(t.count() == 4000)
    assert(t.filter(col("v") === "hit").count() == 1)
    assert(canon(t.filter(col("k") === 3777).select("v")) ==
      canon(Seq("hit").toDF("v")))
  }

  /** Retry a statement whose commit may lose a CAS race — the
    * documented caller contract for every row-level protocol. */
  private def retrying[T](body: => T): T = {
    var n = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if n < 100 &&
            Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
              .exists(_.isInstanceOf[java.util.ConcurrentModificationException]) =>
          n += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** (k, v) contents of one retained version. */
  private def contentsOf(path: String, v: Long): Map[Int, String] =
    GraftTable.readVersion(spark, path, v).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  test("racing stock UPDATEs vs appends vs vacuum: every landed version verifies against its parent") {
    val path = s"$warehouse/ns/racecow"
    GraftTable.overwrite(spark.range(0, 12)
      .selectExpr("cast(id as int) AS k", "'init' AS v").repartition(4), path)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tUpd = new Thread(() => {
      val rnd = new scala.util.Random(7)
      try (0 until 6).foreach { i =>
        val k = rnd.nextInt(12)
        retrying(spark.sql(s"UPDATE grl.ns.racecow SET v = 'u$k-$i' WHERE k = $k"))
      } catch { case e: Throwable => failures.add(e): Unit }
    })
    val tOther = new Thread(() => {
      import spark.implicits._
      try (0 until 6).foreach { i =>
        retrying(GraftTable.append(Seq((100 + i, s"a$i")).toDF("k", "v"), path))
        // grace-windowed vacuum is SAFE to run concurrently: in-flight
        // staged files and fresh dv sidecars are younger than the
        // orphan grace and survive; only provably-dead files reclaim
        if (i % 2 == 1) GraftTable.vacuum(path, keepVersions = 3): Unit
      } catch { case e: Throwable => failures.add(e): Unit }
    })
    tUpd.start(); tOther.start(); tUpd.join(); tOther.join()
    assert(failures.isEmpty, s"racer died: ${Option(failures.peek()).map(_.toString)}")
    // retained versions are a contiguous suffix; each landed commit
    // re-verifies against its parent through the op's own model
    val vs = GraftTable.versions(path).map(_._1)
    assert(vs == (vs.head to vs.last), s"version gap: $vs")
    val head = GraftTable.currentVersion(path).get
    assert(head == 1L + 12, s"12 committing ops after v1, head=$head")
    val byV = GraftTable.versions(path).map(t => t._1 -> t._3).toMap
    vs.sliding(2).filter(_.size == 2).foreach { pair =>
      val Seq(p, v) = pair
      val (parent, cur) = (contentsOf(path, p), contentsOf(path, v))
      byV(v) match {
        case "update_rowlevel" =>
          assert(cur.keySet == parent.keySet, s"v$v update changed the key set")
          val changed = cur.filter { case (k, value) => parent(k) != value }
          assert(changed.nonEmpty && changed.forall { case (k, value) =>
            value.matches(s"u$k-\\d+") }, s"v$v update diff: $changed")
          assert(changed.keySet.size == 1, s"v$v touched multiple keys: $changed")
        case "append" =>
          assert((cur -- parent.keys).forall(_._2.startsWith("a")), s"v$v append diff")
          assert(parent.forall { case (k, value) => cur.get(k).contains(value) },
            s"v$v append disturbed existing rows")
        case other => fail(s"unexpected op '$other' at v$v")
      }
    }
    // final state: all 6 appends present, every k<12 either init or its
    // LAST update's tag
    val fin = contentsOf(path, head)
    assert((0 until 6).forall(i => fin.get(100 + i).contains(s"a$i")))
    assert((0 until 12).forall(k =>
      fin(k) == "init" || fin(k).matches(s"u$k-\\d+")))
  }

  test("racing MOR UPDATEs vs deleteWhereMor vs vacuum on a deletion-vectors table") {
    val path = s"$warehouse/ns/racemor"
    GraftTable.overwrite(spark.range(0, 100)
      .selectExpr("cast(id as int) AS k", "concat('init', id) AS v").repartition(4), path)
    GraftTable.setProperties(path, Map("graft.deletionVectors" -> "true"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val delTargets = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val tUpd = new Thread(() => {
      val rnd = new scala.util.Random(11)
      try (0 until 5).foreach { i =>
        val k = rnd.nextInt(12) // disjoint from the delete key space
        retrying(spark.sql(s"UPDATE grl.ns.racemor SET v = 'u$k-$i' WHERE k = $k"))
      } catch { case e: Throwable => failures.add(e): Unit }
    })
    val tOther = new Thread(() => {
      val rnd = new scala.util.Random(23)
      try (0 until 5).foreach { i =>
        val k = 50 + rnd.nextInt(20)
        delTargets.add(k)
        retrying(GraftTable.deleteWhereMor(spark, path, col("k") === k)): Unit
        if (i % 2 == 1) GraftTable.vacuum(path, keepVersions = 3): Unit
      } catch { case e: Throwable => failures.add(e): Unit }
    })
    tUpd.start(); tOther.start(); tUpd.join(); tOther.join()
    assert(failures.isEmpty, s"racer died: ${Option(failures.peek()).map(_.toString)}")
    val vs = GraftTable.versions(path).map(_._1)
    assert(vs == (vs.head to vs.last), s"version gap: $vs")
    val byV = GraftTable.versions(path).map(t => t._1 -> t._3).toMap
    import scala.jdk.CollectionConverters._
    val delSet = delTargets.asScala.map(_.toInt).toSet
    vs.sliding(2).filter(_.size == 2).foreach { pair =>
      val Seq(p, v) = pair
      val (parent, cur) = (contentsOf(path, p), contentsOf(path, v))
      byV(v) match {
        case "update_rowlevel_mor" =>
          assert(cur.keySet == parent.keySet, s"v$v MOR update changed the key set")
          val changed = cur.filter { case (k, value) => parent(k) != value }
          assert(changed.forall { case (k, value) => value.matches(s"u$k-\\d+") },
            s"v$v MOR update diff: $changed")
        case "delete_mor" =>
          val gone = parent.keySet -- cur.keySet
          assert(gone.subsetOf(delSet), s"v$v deleted outside the target set: $gone")
          assert(cur.forall { case (k, value) => parent.get(k).contains(value) },
            s"v$v delete disturbed surviving rows")
        case "set_properties" => assert(cur == parent)
        case other => fail(s"unexpected op '$other' at v$v")
      }
    }
    val fin = contentsOf(path, GraftTable.currentVersion(path).get)
    assert(fin.size == 100 - delSet.size)
    assert(delSet.forall(k => !fin.contains(k)))
  }

  test("history and time travel survive a row-level commit") {
    val path = s"$warehouse/ns/hist"
    GraftTable.overwrite(Seq((1, "a")).toDF("k", "v"), path)
    val v0 = GraftTable.currentVersion(path).get
    spark.sql("UPDATE grl.ns.hist SET v = 'b' WHERE k = 1")
    assert(GraftTable.currentVersion(path).get == v0 + 1)
    assert(canon(spark.sql(s"SELECT * FROM grl.ns.hist VERSION AS OF $v0")) ==
      canon(Seq((1, "a")).toDF("k", "v")))
    assert(canon(spark.table("grl.ns.hist")) == canon(Seq((1, "b")).toDF("k", "v")))
  }

  test("CHECK constraints veto row-level updates that would violate them") {
    val path = s"$warehouse/ns/chk"
    GraftTable.overwrite(Seq((1, 5)).toDF("k", "n"), path)
    GraftTable.addCheck(spark, path, "pos_n", "n > 0")
    intercept[Exception](spark.sql("UPDATE grl.ns.chk SET n = -1 WHERE k = 1"))
    assert(canon(spark.table("grl.ns.chk")) == canon(Seq((1, 5)).toDF("k", "n")))
    spark.sql("UPDATE grl.ns.chk SET n = 7 WHERE k = 1")
    assert(canon(spark.table("grl.ns.chk")) == canon(Seq((1, 7)).toDF("k", "n")))
  }
}
