package graft

import org.apache.spark.sql.SparkSession

/** The session bootstrap a graft deployment REQUIRES — one place owning
  * the confs that make the library's declared layouts actually pay off,
  * instead of a copy-pasted trio drifting across entry points.
  *
  *  - the v2 bucketing trio: without it, co-bucketed GraftTables
  *    ([[graft.core.GraftTable.writeBucketed]] → `bucket(n, key)`
  *    partitioning) join with two full exchanges the layout exists to
  *    delete — at 100 TB, the dominant cost of every fact⋈fact join;
  *  - `partiallyClusteredDistribution`: the storage-partitioned-join
  *    SKEW ESCAPE. Without it a hot bucket (the reference's dummy-member
  *    key-0 attractor, `models/dwh/fact_order.sql:17-19`) serializes its
  *    whole join into ONE task — the way AQE handles shuffle skew
  *    unasked, a graft session must handle SPJ skew unasked. The conf
  *    is Spark's own (SPARK-42038): the skewed side keeps its input
  *    splits, the other side replicates per split, results unchanged
  *    (q180 hash-gates that; GraftSpjSpec pins multi-task execution in
  *    a DEFAULT graft session with no per-query conf).
  *
  * THE documented trade (Spark 4.x, `KeyGroupedShuffleSpec
  * .canCreatePartitioning`): while the skew escape is on, Spark refuses
  * to shuffle an UNBUCKETED join side by the bucket function — a mixed
  * bucketed⋈unbucketed join plans ordinary exchanges instead of the
  * one-side function shuffle. The default chooses the escape because
  * the failure modes are asymmetric: a serialized hot bucket is one
  * task grinding through a fact table's hottest key (a cluster-killer
  * that AQE cannot touch — there is no exchange to re-split), while the
  * lost one-side shuffle degrades to exchanges AQE still coalesces. A
  * stage dominated by mixed joins opts out by setting
  * `partiallyClusteredDistribution.enabled=false` for that stage
  * (GraftSpjSpec pins both directions of the trade).
  *
  * Use [[configure]] on a builder (Verify/Bench/PlanAudit/tests all
  * do), or copy [[RequiredConfs]] into `spark-defaults.conf` for a
  * deployed cluster. All four are Spark-native confs — a graft table
  * read through a session missing them is still CORRECT, just slower
  * (exchanges reappear; hot buckets serialize). */
object GraftSession {

  val RequiredConfs: Seq[(String, String)] = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true")

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    RequiredConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
