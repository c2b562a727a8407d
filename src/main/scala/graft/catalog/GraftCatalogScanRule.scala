package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.core.GraftTable
import graft.sources.GraftProjectedRelation

/** Extension-session re-plan of the `format("graft")` MOR fallback:
  * a [[GraftProjectedRelation]] (the V1 correctness-first relation a
  * dirty snapshot resolves to) is rebuilt as the PER-FILE split the
  * Scala API uses — clean files on the plain vectorized manifest-
  * FileIndex scan, dirty files on the same vectorized scan plus their
  * liveness/rename projection.
  *
  * Catalog-NAMED tables no longer route through here at all: their
  * [[GraftNamedScan]] is a real DSv2 `Scan → Batch`
  * ([[graft.sources.GraftBatch]]) with per-file DV/rename handling
  * inside the reader factory, so stock and extension sessions plan the
  * identical vectorized scan. The former v2-relation swap this rule
  * carried is retired.
  *
  * Write-side and DML targets are left untouched (guarded via the
  * identity keep-set) so a half-configured session fails loudly
  * instead of planning a write against a read-only projection.
  *
  * Attribute identity: the replacement plan re-derives the same columns
  * from the same manifest schema, but with fresh exprIds — the rewrite
  * aliases them back to the original relation's output ids so every
  * downstream reference resolves unchanged. */
case class GraftCatalogScanRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.exists {
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
