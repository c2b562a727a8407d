package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.quality.Checks
import graft.operators.Ops

/** dbt-semantics data-quality checks and the bucketized range join. */
class ChecksSpec extends AnyFunSuite with SparkSpecBase {

  private def reportMap(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("checks mirror dbt semantics: NULL handling per test type") {
    val t = df("k INT, v STRING",
      Row(Int.box(1), "a"), Row(Int.box(1), "b"), // k=1 duplicated
      Row(Int.box(2), null),                      // null v
      Row(null, "zz"))                            // null k: not a unique violation
    val parent = df("pk INT", Row(Int.box(1)), Row(Int.box(2)))
    val rep = reportMap(Checks.suite(Seq(
      Checks.notNull(t, "v", "t.v"),
      Checks.unique(t, "k", "t.k"),
      Checks.acceptedValues(t, "v", Seq("a", "b"), "t.v_accepted"),
      Checks.relationships(t, "k", parent, "pk", "t.k->parent.pk"))))
    assert(rep(("not_null", "t.v")) == 1L)
    assert(rep(("unique", "t.k")) == 1L)          // one duplicated VALUE, not two rows
    assert(rep(("accepted_values", "t.v_accepted")) == 1L) // "zz"; NULL passes
    assert(rep(("relationships", "t.k->parent.pk")) == 0L) // NULL child key ignored
  }

  test("relationships counts orphans; enforce throws on named failures only") {
    val child = df("fk INT", Row(Int.box(1)), Row(Int.box(9)), Row(Int.box(9)))
    val parent = df("pk INT", Row(Int.box(1)))
    val rep = Checks.suite(Seq(
      Checks.relationships(child, "fk", parent, "pk", "c->p"),
      Checks.notNull(child, "fk", "c.fk")))
    assert(reportMap(rep)(("relationships", "c->p")) == 2L)
    val err = intercept[IllegalStateException](Checks.enforce(rep))
    assert(err.getMessage.contains("relationships[c->p]=2"))
    // scoping severity to a passing check type lets the suite through
    val rows = Checks.enforce(rep, errorChecks = Set("not_null"))
    assert(rows.length == 2)
  }

  test("rangeJoin equals the naive BETWEEN join, inclusive bounds, NULLs drop") {
    val pts = df("pid INT, x DOUBLE", (0 until 50).map(i =>
      Row(Int.box(i), Double.box(i * 7.0 % 97))) :+ Row(Int.box(99), null): _*)
    val ranges = df("rid INT, lo DOUBLE, hi DOUBLE",
      Row(Int.box(0), Double.box(0.0), Double.box(20.0)),
      Row(Int.box(1), Double.box(15.0), Double.box(15.0)),   // degenerate point range
      Row(Int.box(2), Double.box(14.0), Double.box(80.0)),   // wide, overlapping
      Row(Int.box(3), Double.box(90.0), Double.box(9.0)),    // inverted: dropped
      Row(Int.box(4), null, Double.box(5.0)))                // NULL bound: dropped
    val got = Ops.rangeJoin(pts, ranges, "x", "lo", "hi", bucketWidth = 10.0)
      .select(col("pid"), col("rid"))
    val naive = pts.join(ranges, col("x") >= col("lo") && col("x") <= col("hi"))
      .select(col("pid"), col("rid"))
    assert(canon(got) == canon(naive) && got.count() > 0)
  }

  test("rangeJoin span guard fails loudly on a degenerate catch-all range") {
    val pts = df("pid INT, x DOUBLE", Row(Int.box(1), Double.box(1.0)))
    val ranges = df("rid INT, lo DOUBLE, hi DOUBLE",
      Row(Int.box(0), Double.box(0.0), Double.box(1e9)))
    val err = intercept[Exception] {
      Ops.rangeJoin(pts, ranges, "x", "lo", "hi", bucketWidth = 1.0,
        maxSpanBuckets = 100).count()
    }
    assert(err.getMessage != null && err.getMessage.contains("rangeJoin"))
  }

  test("gapFill densifies per key: LOCF carries, zero-fill zeroes, pre-first stays NULL") {
    val daily = df("k STRING, day DATE, v DOUBLE, n BIGINT",
      Row("A", java.sql.Date.valueOf("2024-01-01"), Double.box(10.0), Long.box(2L)),
      Row("A", java.sql.Date.valueOf("2024-01-03"), Double.box(30.0), Long.box(1L)),
      Row("B", java.sql.Date.valueOf("2024-01-02"), Double.box(5.0), Long.box(4L)))
    val out = Ops.gapFill(daily, Seq("k"), "day", "2024-01-01", "2024-01-04",
        ffillCols = Seq("v"), zeroFillCols = Seq("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) null else r.getDouble(2), r.getLong(3))).toSet
    assert(out == Set(
      ("A", "2024-01-01", 10.0, 2L), ("A", "2024-01-02", 10.0, 0L),
      ("A", "2024-01-03", 30.0, 1L), ("A", "2024-01-04", 30.0, 0L),
      ("B", "2024-01-01", null, 0L), ("B", "2024-01-02", 5.0, 4L),
      ("B", "2024-01-03", 5.0, 0L), ("B", "2024-01-04", 5.0, 0L)))
  }

  test("kAnonymize drops sub-k cohorts whole; NULL quasi-values form their own cohort") {
    val t = df("city STRING, age INT, id INT",
      Row("x", Int.box(30), Int.box(1)), Row("x", Int.box(30), Int.box(2)),
      Row("x", Int.box(31), Int.box(3)),            // cohort of 1: suppressed
      Row(null, null, Int.box(4)), Row(null, null, Int.box(5))) // NULL cohort of 2
    val out = graft.operators.Corpus.kAnonymize(t, Seq("city", "age"), k = 2)
      .collect().map(r => (r.getInt(r.fieldIndex("id")), r.getLong(r.fieldIndex("group_n")))).toSet
    assert(out == Set((1, 2L), (2, 2L), (4, 2L), (5, 2L)))
  }

  test("rangeJoin renames clashing range columns with the prefix") {
    val pts = df("id INT, x DOUBLE", Row(Int.box(1), Double.box(5.0)))
    val ranges = df("id INT, lo DOUBLE, hi DOUBLE",
      Row(Int.box(7), Double.box(0.0), Double.box(10.0)))
    val out = Ops.rangeJoin(pts, ranges, "x", "lo", "hi", bucketWidth = 10.0)
    assert(out.columns.toSeq == Seq("id", "x", "r_id", "lo", "hi"))
    val r = out.head
    assert(r.getInt(0) == 1 && r.getInt(2) == 7)
  }
}
