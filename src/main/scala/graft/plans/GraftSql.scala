package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

import graft.core.GraftTable

/** The SQL front door for GraftTable time travel — the dialect-level
  * counterpart of the reference's `AT (TIMESTAMP => …)` clause
  * (`models/intermediate/stg_dim_customer.sql:71`), which Snowflake
  * exposes *in SQL* while our [[GraftTable.readVersion]]/[[GraftTable.readAsOf]]
  * were Scala-only. Three TABLE-VALUED FUNCTIONS registered on the live
  * session's `TableFunctionRegistry` (the table-grain sibling of the
  * `graft_minhash` scalar registration,
  * [[graft.expressions.VectorExpressions]]):
  *
  * {{{
  *   SELECT … FROM graft_table('/path/t')                      -- head snapshot
  *   SELECT … FROM graft_table_version('/path/t', 3)           -- VERSION AS OF 3
  *   SELECT … FROM graft_table_at('/path/t', TIMESTAMP '…')    -- TIMESTAMP AS OF
  *   SELECT … FROM graft_table_at('/path/t', 1700000000000000) -- epoch micros
  *   SELECT … FROM graft_table_changes('/path/t', 1, 4, 'id')  -- CHANGES between versions
  *   SELECT … FROM graft_table_changes_at('/path/t', TIMESTAMP 'a', TIMESTAMP 'b', 'id') -- CHANGES AT/END
  *   SELECT … FROM graft_table_history('/path/t')              -- DESCRIBE HISTORY
  *   SELECT … FROM graft_table_files('/path/t'[, 2])            -- DESCRIBE DETAIL (file grain)
  *   SELECT … FROM graft_table_checks('/path/t')               -- active CHECK constraints
  *   SELECT … FROM graft_table_stats('/path/t')                -- per-column stats/bloom coverage
  *   SELECT … FROM graft_table_consumers('/path/t')            -- consumer bookmarks + lag
  * }}}
  *
  * Each call resolves, at ANALYSIS time, to the snapshot-isolated logical
  * plan of the manifest-pinned parquet scan the Scala API would build —
  * so the TVF composes with everything SQL (joins, CTEs, subqueries,
  * views), inherits Catalyst's pushdown/pruning over the scan, and
  * [[GraftPrune]] (when installed) file-skips it exactly like an
  * API-built read. Arguments must be literals: a table path is plan
  * structure, not data — the same line `read_parquet('…')`-style TVFs
  * draw everywhere. */
object GraftSql {

  /** Register the three TVFs on `spark`'s session function registry
    * (idempotent; session-scoped like any temp function). */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry

    // a plain string-literal argument (key-column lists and the like) —
    // NEVER name-resolved
    def strLit(fn: String, e: Expression): String = e match {
      case Literal(v, StringType) if v != null => v.toString
      case other => fail(fn, s"a string literal, got $other")
    }

    // A TVF target is a path ('/w/t') or a catalog NAME ('dwh.t', with
    // an optional 'graft.' prefix) — names resolve through the same
    // warehouse conf the maintenance dialect and GraftCatalog use, so
    // graft_table_history('dwh.dim_customer') works the moment the
    // catalog is configured. Slash-bearing strings stay paths verbatim.
    def pathOf(fn: String, e: Expression): String = e match {
      case Literal(v, StringType) if v != null =>
        val s = v.toString
        if (s.contains("/")) s
        else GraftMaintenance.resolve(
          if (s.toLowerCase.startsWith("graft.")) s.substring(6) else s)
      case other => fail(fn, s"a string-literal table path, got $other")
    }

    def register(name: String, builder: Seq[Expression] => LogicalPlan): Unit =
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(GraftSql.getClass.getName, name), builder)

    register("graft_table", {
      case Seq(p) => plan(spark, GraftTable.read(spark, pathOf("graft_table", p)))
      case args => fail("graft_table", s"(path), got ${args.size} argument(s)")
    })
    register("graft_table_version", {
      case Seq(p, v) =>
        plan(spark, GraftTable.readVersion(spark,
          pathOf("graft_table_version", p), longLit("graft_table_version", v)))
      case args => fail("graft_table_version", s"(path, version), got ${args.size} argument(s)")
    })
    register("graft_table_at", {
      case Seq(p, t) =>
        plan(spark, GraftTable.readAsOf(spark,
          pathOf("graft_table_at", p), tsMicros("graft_table_at", t)))
      case args => fail("graft_table_at", s"(path, timestamp), got ${args.size} argument(s)")
    })
    // DESCRIBE HISTORY as a relation — per-commit version/op/file/row
    // counts from manifest metadata alone (no leaf bodies parsed)
    register("graft_table_history", {
      case Seq(p) =>
        plan(spark, GraftTable.history(spark, pathOf("graft_table_history", p)))
      case args => fail("graft_table_history", s"(path), got ${args.size} argument(s)")
    })
    // DESCRIBE DETAIL at file grain — layout debugging from manifest
    // metadata alone (zero data IO)
    register("graft_table_files", {
      case Seq(p) =>
        plan(spark, GraftTable.describeFiles(spark, pathOf("graft_table_files", p)))
      case Seq(p, v) =>
        plan(spark, GraftTable.describeFiles(spark, pathOf("graft_table_files", p),
          Some(longLit("graft_table_files", v))))
      case args => fail("graft_table_files", s"(path[, version]), got ${args.size} argument(s)")
    })
    // the active CHECK constraints as a relation
    register("graft_table_checks", {
      case Seq(p) =>
        plan(spark, GraftTable.describeChecks(spark, pathOf("graft_table_checks", p)))
      case args => fail("graft_table_checks", s"(path), got ${args.size} argument(s)")
    })
    // per-column stats/bloom coverage — the "what should I ANALYZE?"
    // introspection (manifest metadata alone, zero data IO)
    register("graft_table_stats", {
      case Seq(p) =>
        plan(spark, GraftTable.describeStats(spark, pathOf("graft_table_stats", p)))
      case args => fail("graft_table_stats", s"(path), got ${args.size} argument(s)")
    })
    // registered consumer bookmarks + lag — "which lagging consumer is
    // pinning my vacuum horizon?" (the retention contract's ledger)
    register("graft_table_consumers", {
      case Seq(p) =>
        plan(spark, GraftTable.describeConsumers(spark, pathOf("graft_table_consumers", p)))
      case args => fail("graft_table_consumers", s"(path), got ${args.size} argument(s)")
    })
    // manifest-carried table properties (SHOW TBLPROPERTIES as a TVF —
    // joinable, filterable)
    register("graft_table_properties", {
      case Seq(p) =>
        plan(spark, GraftTable.describeProperties(spark, pathOf("graft_table_properties", p)))
      case args => fail("graft_table_properties", s"(path), got ${args.size} argument(s)")
    })
    // the CHANGES consumer surface (Snowflake `CHANGES ... AT/END`,
    // Delta `table_changes(...)`) — row-level diff between two versions,
    // keyed on a comma-separated key-column list
    register("graft_table_changes", {
      case Seq(p, f, t, k) =>
        val keys = strLit("graft_table_changes", k).split(",").map(_.trim).filter(_.nonEmpty)
        plan(spark, GraftTable.diffVersions(spark, pathOf("graft_table_changes", p),
          longLit("graft_table_changes", f), longLit("graft_table_changes", t),
          keys.toIndexedSeq))
      case args => fail("graft_table_changes",
        s"(path, from_version, to_version, 'key1,key2,…'), got ${args.size} argument(s)")
    })
    // the timestamp-pinned CHANGES span — Snowflake's `CHANGES … AT
    // (TIMESTAMP => a) END (TIMESTAMP => b)` habit (the reference pins
    // by timestamp, `models/intermediate/stg_dim_customer.sql:71`):
    // each instant resolves to the last version committed at or before
    // it, then the span diffs exactly like the version form
    register("graft_table_changes_at", {
      case Seq(p, f, t, k) =>
        val path = pathOf("graft_table_changes_at", p)
        val keys = strLit("graft_table_changes_at", k).split(",").map(_.trim).filter(_.nonEmpty)
        plan(spark, GraftTable.diffVersions(spark, path,
          GraftTable.manifestAsOf(path, tsMicros("graft_table_changes_at", f)).version,
          GraftTable.manifestAsOf(path, tsMicros("graft_table_changes_at", t)).version,
          keys.toIndexedSeq))
      case args => fail("graft_table_changes_at",
        s"(path, from_timestamp, to_timestamp, 'key1,key2,…'), got ${args.size} argument(s)")
    })
  }

  /** SQL TEXT for the write path — `MERGE INTO` / `DELETE FROM` /
    * `UPDATE` / `ALTER TABLE … ADD/DROP CONSTRAINT` parse through
    * Spark's own grammar; `VACUUM` / `OPTIMIZE [ZORDER BY (cols…)]` /
    * `RESTORE` / `CLONE` / `ANALYZE … COMPUTE STATS|BLOOM`
    * through the tiny [[GraftMaintenance]] grammar Spark lacks — all
    * routed to the existing table operators (see [[GraftDml]] for the
    * dialect contract). Returns the committed version (DML and
    * constraint ops), the deleted-file count (VACUUM), or the
    * files-after count (OPTIMIZE). Sessions built with the
    * GraftExtensions get the same statements inside plain
    * `spark.sql(...)`; this entry serves sessions created without it
    * (the analyzer is fixed at build time). */
  def dml(spark: SparkSession, sql: String): Long = {
    // named targets resolve through the ACTIVE session's warehouse conf
    // — pin it to the session the statement was handed to
    SparkSession.setActiveSession(spark)
    GraftMaintenance.parse(sql) match {
      case Some(c: GraftVacuumCommand) => return c.execute(spark)
      case Some(c: GraftOptimizeCommand) => return c.execute(spark)._2.toLong
      case Some(c: GraftRestoreCommand) => return c.execute(spark)
      case Some(c: GraftCloneCommand) => return c.execute(spark)
      case Some(c: GraftAnalyzeCommand) => return c.execute(spark)
      case Some(c: GraftReorgCommand) => return c.execute(spark)
      case Some(c: GraftReplaceWhereCommand) => return c.execute(spark)
      case Some(c: GraftTruncateCommand) => return c.execute(spark)
      case _ => ()
    }
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    GraftDml.route(spark, parsed).getOrElse(
      throw new IllegalArgumentException(
        "not a graft DML/maintenance statement (expected MERGE INTO / DELETE FROM / " +
          "UPDATE / INSERT INTO|OVERWRITE / INSERT INTO … REPLACE WHERE / " +
          "CREATE [OR REPLACE] TABLE … AS SELECT / TRUNCATE TABLE / " +
          "ALTER TABLE ADD|DROP CONSTRAINT / ALTER TABLE ADD|RENAME|DROP COLUMN / " +
          "VACUUM / OPTIMIZE / RESTORE / CLONE / ANALYZE " +
          "over a graft.`/path` target): " + sql.trim.take(120)))
  }

  private def plan(spark: SparkSession, df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical

  private def fail(fn: String, what: String): Nothing =
    throw new IllegalArgumentException(s"$fn expects $what — time-travel pins are " +
      "plan structure and must be literals")

  private def longLit(fn: String, e: Expression): Long = e match {
    case Literal(v, ByteType | ShortType | IntegerType | LongType) if v != null =>
      v.toString.toLong
    case other => fail(fn, s"an integer-literal version, got $other")
  }

  /** A time-travel instant: a TIMESTAMP/TIMESTAMP_NTZ literal (already
    * epoch micros internally), an integral epoch-micros literal, or a
    * `'yyyy-MM-dd HH:mm:ss[.ffffff]'` string parsed as UTC (the engine's
    * session convention). */
  private def tsMicros(fn: String, e: Expression): Long = e match {
    case Literal(v: Long, TimestampType | TimestampNTZType) => v
    case Literal(v, ByteType | ShortType | IntegerType | LongType) if v != null =>
      v.toString.toLong
    case Literal(v, StringType) if v != null =>
      val t = java.time.LocalDateTime.parse(v.toString.trim.replace(' ', 'T'))
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    case other => fail(fn, s"a timestamp or epoch-micros literal, got $other")
  }
}
