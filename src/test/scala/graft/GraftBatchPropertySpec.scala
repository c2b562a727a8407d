package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.core.GraftTable
import graft.catalog.GraftCatalog

/** Property gates for the DSv2 read/write surfaces round 11 made
  * load-bearing:
  *
  *  - EQUIVALENCE: after any random sequence of table mutations
  *    (appends, clustered overwrites, COW/MOR deletes and updates,
  *    renames, added columns), a catalog-NAMED read (the
  *    [[graft.sources.GraftBatch]] DSv2 path) returns exactly the
  *    Scala-API read, with and without random filters on top;
  *  - ROW-LEVEL REBASE: a concurrent append landing between a stock
  *    UPDATE's stage and its commit survives (the replace commit
  *    rebases over it), while the update still applies — and the
  *    append's rows are never lost or double-counted. */
class GraftBatchPropertySpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft_batchprop").toString

  spark.conf.set("spark.sql.catalog.gbp", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gbp.warehouse", warehouse)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gbp.ns")

  test("random mutation sequences: named DSv2 read == Scala-API read (3 seeds x 10 ops)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(1000 + seed)
      val name = s"t$seed"
      val path = s"$warehouse/ns/$name"
      def mk(n: Int, off: Int) = spark.range(off, off + n)
        .selectExpr("cast(id as int) AS k",
          "cast(id % 17 as string) AS v", "cast(id % 5 as double) AS x")
      GraftTable.overwrite(mk(300, 0).repartition(3), path, statsCols = Seq("k"))
      var nextOff = 300
      var colRenamed = false
      for (step <- 1 to 10) {
        rnd.nextInt(6) match {
          case 0 =>
            // appendEvolve: the batch lacks columns added by case 5
            GraftTable.appendEvolve(mk(50 + rnd.nextInt(100), nextOff), path)
            nextOff += 150
          case 1 =>
            GraftTable.writeClustered(
              GraftTable.read(spark, path), path, col("k"), 4, statsCols = Seq("k"))
          case 2 =>
            GraftTable.deleteWhere(spark, path, col("k") % 13 === rnd.nextInt(13))
          case 3 =>
            GraftTable.deleteWhereMor(spark, path, col("k") % 11 === rnd.nextInt(11))
          case 4 if !colRenamed =>
            GraftTable.renameColumn(path, "v", "w"); colRenamed = true
          case 4 =>
            GraftTable.updateWhere(spark, path, col("k") % 19 === rnd.nextInt(19),
              Map("x" -> (col("x") + 1)))
          case 5 =>
            GraftTable.addColumn(path, s"n$step", "INT")
        }
        // case-insensitive NAME resolution is catalog territory; the
        // Scala API is the semantic oracle
        val api = GraftTable.read(spark, path)
        val named = spark.table(s"gbp.ns.$name")
        assert(named.columns.toSeq == api.columns.toSeq, s"seed $seed step $step")
        assert(canon(named) == canon(api), s"seed $seed step $step: named != api")
        // a random range filter composes identically (file prune + DV
        // + rename translation under the filter)
        val b = rnd.nextInt(400)
        assert(canon(named.filter(col("k") >= b && col("k") < b + 100)) ==
          canon(api.filter(col("k") >= b && col("k") < b + 100)),
          s"seed $seed step $step: filtered named != api")
      }
    }
  }

  test("row-level UPDATE rebases over a concurrent append: both changes land") {
    val path = s"$warehouse/ns/rebase"
    GraftTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    // the append lands between the UPDATE's stage and its commit
    GraftTable.betweenStageAndCommitForTests = () => {
      // reset FIRST: the concurrent append itself passes the hook point
      GraftTable.betweenStageAndCommitForTests = () => ()
      GraftTable.append(Seq((9, "z")).toDF("k", "v"), path)
    }
    try spark.sql("UPDATE gbp.ns.rebase SET v = 'B' WHERE k = 2")
    finally GraftTable.betweenStageAndCommitForTests = () => ()
    assert(canon(spark.table("gbp.ns.rebase")) ==
      canon(Seq((1, "a"), (2, "B"), (9, "z")).toDF("k", "v")))
  }

  test("row-level UPDATE refuses when a scanned file is rewritten concurrently") {
    val path = s"$warehouse/ns/conflict"
    GraftTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    GraftTable.betweenStageAndCommitForTests = () => {
      GraftTable.betweenStageAndCommitForTests = () => ()
      // rewrite the SAME file the update scanned (k=2's file — a
      // delete of the OTHER file would be a legitimate rebase, which
      // the rebase test above covers)
      GraftTable.deleteWhere(spark, path, col("k") === 2)
    }
    try {
      val e = intercept[Exception](
        spark.sql("UPDATE gbp.ns.conflict SET v = 'B' WHERE k = 2"))
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(
        _.isInstanceOf[java.util.ConcurrentModificationException]), e.toString)
    } finally GraftTable.betweenStageAndCommitForTests = () => ()
    // the concurrent delete won; the update never half-applied
    assert(canon(spark.table("gbp.ns.conflict")) ==
      canon(Seq((1, "a")).toDF("k", "v")))
  }
}
