package graft.plans

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.core.GraftTable
import graft.core.GraftTable.ColRange

/** TRANSPARENT manifest-stats file skipping as a Catalyst optimizer rule:
  * any `Filter` directly over a parquet scan whose files live in a
  * GraftTable's `data/` directory gets its file list narrowed to the
  * files whose per-file [min,max] stats can satisfy the predicate —
  * without the caller ever asking ([[GraftTable.readPruned]] is the
  * explicit spelling of the same skip). The filter itself stays in the
  * plan, so the rewrite is purely a file-set refinement: Spark plans
  * fewer scan tasks, reads fewer footers, and the residual predicate
  * still runs exactly.
  *
  * Why an optimizer rule and not a data source: the scan is already a
  * plain V1 parquet relation with an EXPLICIT file list (how every
  * GraftTable read is built), so skipping is just swapping that list —
  * no custom readers, no new physical operators, and every downstream
  * Spark optimization (pushdown into row groups, vectorized read,
  * whole-stage codegen) is untouched. This is the smallest Catalyst
  * surface that buys Delta-style planning-time skipping.
  *
  * Safety:
  *  - only ranges PROVABLY empty on a file's stats are dropped (the
  *    [[GraftTable.mayMatch]] core, property-tested by the format specs);
  *    strict bounds are relaxed to inclusive before probing — always
  *    conservative;
  *  - stats are matched per FILE basename against every retained
  *    manifest (files are immutable), so version reads and already-
  *    pruned subsets skip correctly too;
  *  - anything unexpected (non-Graft dirs, renamed-projection plans,
  *    exotic predicates, missing stats) degrades to a no-op, never an
  *    error — the rule can only remove provably-dead IO.
  *
  * Install per session with [[GraftPrune.install]] (idempotent; uses
  * `spark.experimental.extraOptimizations`), or globally via
  * `spark.sql.extensions=graft.expressions.GraftExtensions`. */
case class GraftPrune(spark: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, lr: LogicalRelation) =>
      try prune(f, cond, lr) catch { case scala.util.control.NonFatal(_) => f }
  }

  private def prune(f: Filter, cond: Expression, lr: LogicalRelation): LogicalPlan = {
    val fs = lr.relation match {
      case r: HadoopFsRelation => r
      case _ => return f
    }
    val files = fs.location.inputFiles
    if (files.isEmpty) return f
    val dirs = files.map(p => new File(stripScheme(p)).getParentFile).distinct
    if (dirs.length != 1 || dirs(0) == null || !GraftTable.isDataDir(dirs(0))) return f
    val ranges = extractRanges(cond)
    if (ranges.isEmpty) return f
    val root = dirs(0).getParentFile.getPath
    val stats = GraftTable.statsForFiles(root)
    val kept = files.filter { p =>
      val name = p.split('/').last
      stats.get(name).forall(s => GraftTable.mayMatch(s, ranges))
    }
    if (kept.length == files.length) return f // nothing to skip — fixpoint
    val idx = new InMemoryFileIndex(spark,
      kept.map(new org.apache.hadoop.fs.Path(_)).toIndexedSeq,
      Map.empty[String, String], Some(fs.dataSchema))
    Filter(cond, lr.copy(relation = fs.copy(location = idx)(spark)))
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  /** Conjuncts of the shape `attr <op> literal` (either side) become
    * inclusive [[ColRange]]s; everything else contributes nothing (the
    * residual filter keeps exactness). NULL literals yield no range —
    * a NULL comparison matches no row, but proving THAT is the
    * filter's job, not the skipper's. */
  private def extractRanges(cond: Expression): Seq[ColRange] =
    splitConjunctivePredicates(cond).flatMap {
      case GreaterThan(a: AttributeReference, l: Literal) => range(a, lo = Some(l))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => range(a, lo = Some(l))
      case LessThan(a: AttributeReference, l: Literal) => range(a, hi = Some(l))
      case LessThanOrEqual(a: AttributeReference, l: Literal) => range(a, hi = Some(l))
      case EqualTo(a: AttributeReference, l: Literal) => range(a, lo = Some(l), hi = Some(l))
      case GreaterThan(l: Literal, a: AttributeReference) => range(a, hi = Some(l))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => range(a, hi = Some(l))
      case LessThan(l: Literal, a: AttributeReference) => range(a, lo = Some(l))
      case LessThanOrEqual(l: Literal, a: AttributeReference) => range(a, lo = Some(l))
      case EqualTo(l: Literal, a: AttributeReference) => range(a, lo = Some(l), hi = Some(l))
      case _ => Nil
    }

  private def range(a: AttributeReference, lo: Option[Literal] = None,
      hi: Option[Literal] = None): Seq[ColRange] = {
    def ext(l: Literal): Option[Any] =
      Option(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    (lo, hi) match {
      case (Some(l), _) if l.value == null => Nil
      case (_, Some(l)) if l.value == null => Nil
      case _ => Seq(ColRange(a.name, lo.flatMap(ext), hi.flatMap(ext)))
    }
  }
}

object GraftPrune {
  /** Idempotent per-session install into the experimental optimizer
    * hook — the in-session counterpart of the `spark.sql.extensions`
    * registration. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GraftPrune]))
      spark.experimental.extraOptimizations = cur :+ GraftPrune(spark)
  }
}
