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
