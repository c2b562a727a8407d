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
  * files whose per-file stats can satisfy the predicate — without the
  * caller ever asking ([[GraftTable.readPruned]]/[[GraftTable.readPrunedIn]]
  * are the explicit spellings of the same skips). Range conjuncts probe
  * [min,max]; `IN`/`===` conjuncts additionally probe the per-file
  * BLOOM filters when the write listed the column in `bloomCols` — on a
  * hash-distributed layout, where every file spans the full key range,
  * the bloom does all the skipping. The filter itself stays in the
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
    // a format("graft") batch relation already prunes inside its own
    // manifest-backed FileIndex listing — replacing it with a static
    // pruned list would be redundant work, not a better plan
    if (fs.location.isInstanceOf[graft.sources.GraftFileIndex]) return f
    val files = fs.location.inputFiles
    if (files.isEmpty) return f
    val dirs = files.map(p => new File(stripScheme(p)).getParentFile).distinct
    if (dirs.length != 1 || dirs(0) == null || !GraftTable.isDataDir(dirs(0))) return f
    val ranges = GraftPrune.extractRanges(cond)
    val points = GraftPrune.extractPoints(cond)
    if (ranges.isEmpty && points.isEmpty) return f
    val root = dirs(0).getParentFile.getPath
    val stats = GraftTable.statsForFiles(root)
    // one lazy probe-hash job per IN column — paid only when some file's
    // stats actually carry a bloom for it (the readPrunedIn discipline)
    val hashCache = scala.collection.mutable.HashMap.empty[String, Any => Seq[Long]]
    def hashesFor(p: GraftPrune.PointProbe): Any => Seq[Long] =
      hashCache.getOrElseUpdate(p.col, {
        lazy val m = GraftTable.probeHashes(spark, p.dt, p.values, GraftTable.BloomK)
        v => m(v)
      })
    val kept = files.filter { p =>
      val name = p.split('/').last
      stats.get(name).forall { s =>
        GraftTable.mayMatch(s, ranges) &&
          points.forall(pt => GraftTable.mayContainIn(s, pt.col, pt.values, hashesFor(pt)))
      }
    }
    if (kept.length == files.length) return f // nothing to skip — fixpoint
    val idx = new InMemoryFileIndex(spark,
      kept.map(new org.apache.hadoop.fs.Path(_)).toIndexedSeq,
      Map.empty[String, String], Some(fs.dataSchema))
    Filter(cond, lr.copy(relation = fs.copy(location = idx)(spark)))
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
}

object GraftPrune extends PredicateHelper {
  /** Idempotent per-session install into the experimental optimizer
    * hook — the in-session counterpart of the `spark.sql.extensions`
    * registration. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GraftPrune]))
      spark.experimental.extraOptimizations = cur :+ GraftPrune(spark)
  }

  /** Conjuncts of the shape `attr <op> literal` (either side) become
    * inclusive [[ColRange]]s; everything else contributes nothing (the
    * residual filter keeps exactness). NULL literals yield no range —
    * a NULL comparison matches no row, but proving THAT is the
    * filter's job, not the skipper's. Shared by the optimizer rule and
    * the `format("graft")` batch [[graft.sources.GraftFileIndex]]. */
  private[graft] def extractRanges(cond: Expression): Seq[ColRange] =
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

  private[graft] case class PointProbe(col: String,
      dt: org.apache.spark.sql.types.DataType, values: Seq[Any])

  /** Conjuncts of the shape `attr IN (literals…)` (both the `In` form
    * and the set-optimized `InSet` the optimizer rewrites long lists
    * into) become point probes, checked through
    * [[GraftTable.mayContainIn]] — range containment per value PLUS the
    * per-file/per-leaf bloom when the write listed the column in
    * `bloomCols`. On a hash-distributed layout, where every file spans
    * the full key range and min/max prune nothing, the bloom does all
    * the skipping — this makes q131's explicit `readPrunedIn` shape
    * automatic for plain `isin`/`===` filters. NULL probe values drop
    * (IN never matches NULL); an all-NULL list contributes nothing. */
  private[graft] def extractPoints(cond: Expression): Seq[PointProbe] =
    splitConjunctivePredicates(cond).flatMap {
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        point(a, vs.collect { case Literal(v, dt) if v != null =>
          CatalystTypeConverters.convertToScala(v, dt) })
      case InSet(a: AttributeReference, hset) =>
        point(a, hset.toSeq.filter(_ != null)
          .map(CatalystTypeConverters.convertToScala(_, a.dataType)))
      case EqualTo(a: AttributeReference, Literal(v, dt)) if v != null =>
        point(a, Seq(CatalystTypeConverters.convertToScala(v, dt)))
      case EqualTo(Literal(v, dt), a: AttributeReference) if v != null =>
        point(a, Seq(CatalystTypeConverters.convertToScala(v, dt)))
      case _ => Nil
    }

  private def point(a: AttributeReference, values: Seq[Any]): Seq[PointProbe] =
    if (values.isEmpty) Nil else Seq(PointProbe(a.name, a.dataType, values))
}
