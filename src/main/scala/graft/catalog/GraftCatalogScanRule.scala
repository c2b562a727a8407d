package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.core.GraftTable
import graft.sources.GraftProjectedRelation

/** The fast-read path for catalog tables in extension sessions
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`): replace a
  * batch [[DataSourceV2Relation]] over a [[GraftNamedTable]] with the
  * SAME vectorized manifest-FileIndex plan the Scala API builds — so a
  * named read (`SELECT … FROM graft.dwh.t [VERSION AS OF v]`,
  * `spark.table("graft.dwh.t")`) plans a stock parquet FileScan with
  * stats/bloom file-skipping inside `listFiles`, whole-stage codegen,
  * and zero V1 row boundaries. Delta's DeltaAnalysis relation
  * conversion, re-derived for the manifest format.
  *
  * Write-side and DML targets are left untouched: AppendData /
  * InsertIntoStatement keep the v2 relation (the V1_BATCH_WRITE
  * fallback plans through [[GraftNamedTable.newWriteBuilder]]), and
  * DELETE/UPDATE/MERGE targets never reach here in extension sessions
  * (the parse-time rewrite claims them) but are guarded anyway so a
  * half-configured session fails loudly instead of planning a write
  * against a read-only projection.
  *
  * Attribute identity: the replacement plan re-derives the same columns
  * from the same manifest schema, but with fresh exprIds — the rewrite
  * aliases them back to the v2 relation's output ids so every
  * downstream reference resolves unchanged. */
case class GraftCatalogScanRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.exists {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftNamedTable]
      case lr: LogicalRelation => lr.relation.isInstanceOf[GraftProjectedRelation]
      case _ => false
    }) return plan
    // write/DML targets keep their v2 relation (identity set — the same
    // relation object may legally appear again in the query side, where
    // rewriting IS wanted)
    val keep = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean])
    plan.foreach {
      case c: V2WriteCommand => keep.add(c.table)
      case i: InsertIntoStatement => keep.add(i.table)
      case d: DeleteFromTable => keep.add(d.table)
      case u: UpdateTable => keep.add(u.table)
      case m: MergeIntoTable => keep.add(m.targetTable)
      case _ => ()
    }
    // transformUp, not resolveOperatorsUp: the relation leaf is already
    // analyzed (ResolveRelations produced it) and resolveOperators*
    // skips analyzed subtrees; the match is convergent (the replacement
    // contains no v2 relation), so the fixed-point batch terminates
    plan.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftNamedTable] && !keep.contains(r) =>
        val t = r.table.asInstanceOf[GraftNamedTable]
        val df = t.pin match {
          case Some(v) => GraftTable.readVersion(spark, t.path, v)
          case None => GraftTable.read(spark, t.path)
        }
        val scan = df.queryExecution.analyzed
        require(scan.output.length == r.output.length,
          s"graft catalog scan of '${t.path}' produced ${scan.output.length} columns, " +
            s"relation expected ${r.output.length} — concurrent schema change; re-run")
        // positional aliasing is only safe when the names still line up:
        // a same-arity concurrent RENAME COLUMN must fail loudly, not
        // silently remap columns to another column's data
        r.output.zip(scan.output).foreach { case (o, n) =>
          require(o.name.equalsIgnoreCase(n.name),
            s"graft catalog scan of '${t.path}' column '${n.name}' no longer matches " +
              s"relation column '${o.name}' — concurrent schema change; re-run")
        }
        Project(r.output.zip(scan.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, scan)

      // format("graft") over a table whose snapshot carries deletion
      // vectors or rename maps resolves to the correctness-first V1
      // fallback relation (whole-relation RDD[Row] boundary). In
      // extension sessions, re-plan it as the PER-FILE split the Scala
      // API uses ([[GraftTable.readFileSubset]]): clean files on the
      // plain vectorized manifest-FileIndex scan, dirty files on the
      // same vectorized scan plus their liveness/rename projection —
      // one dirty file never changes the scan class of the million
      // clean ones (the VERDICT's 100 TB MOR watch item).
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftProjectedRelation] &&
          !keep.contains(lr) =>
        val gp = lr.relation.asInstanceOf[GraftProjectedRelation]
        val df = GraftTable.readFileSubset(spark, gp.tablePath,
          gp.pinnedManifest, gp.pinnedEntries)
        val scan = df.queryExecution.analyzed
        require(scan.output.length == lr.output.length,
          s"graft scan of '${gp.tablePath}' produced ${scan.output.length} columns, " +
            s"relation expected ${lr.output.length}")
        Project(lr.output.zip(scan.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, scan)
    }
  }
}
