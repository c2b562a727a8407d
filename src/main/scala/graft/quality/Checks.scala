package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt's generic schema tests — `not_null`, `unique`, `accepted_values`,
  * `relationships` — as Spark operators. The reference IS a dbt project
  * (its `tests/` dir is empty, but the four generic tests are the dbt
  * contract surface every model's `schema.yml` would declare; dbt docs,
  * re-derived), so a user switching engines needs them first-class.
  *
  * Every check returns the SAME report shape — one row
  * (check_name, target, n_violations) — so suites union cleanly and the
  * gate is a plain table compare. Violation SEMANTICS mirror dbt exactly:
  *  - `not_null`: rows where the column IS NULL;
  *  - `unique`: DISTINCT values occurring more than once (dbt's failing
  *    query groups by value HAVING count > 1 — NULLs excluded, like dbt);
  *  - `accepted_values`: non-NULL rows outside the list (NULL passes —
  *    that's `not_null`'s job);
  *  - `relationships`: non-NULL child keys with no parent row.
  *
  * Scale shapes: not_null / accepted_values are single combinable
  * aggregations (no shuffle beyond the final 1-row reduce); unique is one
  * map-side-combinable count at value grain; relationships is a left-anti
  * join on the key — broadcast when the parent is dimension-sized, the
  * standard shuffle otherwise. Nothing here collects data rows: a failing
  * check at 100 TB reports a count, and the violating ROWS are one
  * documented filter away for triage. */
object Checks {

  private def report(check: String, target: String, n: Column, df: DataFrame): DataFrame =
    df.agg(n.cast("long").as("n_violations"))
      .select(lit(check).as("check_name"), lit(target).as("target"), col("n_violations"))

  /** Rows where `colName` IS NULL. */
  def notNull(df: DataFrame, colName: String, target: String): DataFrame =
    report("not_null", target, count(when(col(colName).isNull, lit(1))), df)

  /** Distinct non-NULL values of `colName` occurring more than once. */
  def unique(df: DataFrame, colName: String, target: String): DataFrame = {
    val dups = df.filter(col(colName).isNotNull)
      .groupBy(col(colName)).agg(count(lit(1)).as("c")).filter(col("c") > 1)
    report("unique", target, count(lit(1)), dups)
  }

  /** Non-NULL rows whose `colName` is outside `accepted`. */
  def acceptedValues(df: DataFrame, colName: String, accepted: Seq[Any],
      target: String): DataFrame = {
    require(accepted.nonEmpty, "accepted list must not be empty")
    report("accepted_values", target,
      count(when(col(colName).isNotNull && !col(colName).isin(accepted: _*), lit(1))), df)
  }

  /** Non-NULL child keys with no matching parent key (referential
    * integrity). Broadcast the parent side when it is dimension-sized. */
  def relationships(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, target: String, broadcastParent: Boolean = true): DataFrame = {
    val p0 = parent.select(col(parentCol).as("__pk")).distinct()
    val p = if (broadcastParent) broadcast(p0) else p0
    val orphans = child.filter(col(childCol).isNotNull)
      .join(p, col(childCol) === col("__pk"), "left_anti")
    report("relationships", target, count(lit(1)), orphans)
  }

  /** Union a suite into one report, ordered by (check_name, target). */
  def suite(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    checks.reduce(_ unionByName _).orderBy(col("check_name"), col("target"))
  }

  /** dbt `severity: error` semantics: throw if any NAMED check (all by
    * default) reports violations; returns the materialized report
    * otherwise so callers log it. */
  def enforce(reportDf: DataFrame, errorChecks: Set[String] = Set.empty): Array[org.apache.spark.sql.Row] = {
    val rows = reportDf.collect()
    val failing = rows.filter(r => r.getLong(r.fieldIndex("n_violations")) > 0 &&
      (errorChecks.isEmpty || errorChecks.contains(r.getString(r.fieldIndex("check_name")))))
    if (failing.nonEmpty)
      throw new IllegalStateException("data-quality violations: " + failing.map(r =>
        s"${r.getString(0)}[${r.getString(1)}]=${r.getLong(2)}").mkString(", "))
    rows
  }
}
