package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import graft.core.TableIO
import graft.scd.{Scd2, Scd2Config}

/** Structured Streaming skins over the batch transformers.
  *
  * The reference has no streaming surface (SURVEY §2.9) — its closest analogue
  * is the minute-granular replay loop, an orchestration-time batch pattern.
  * These entry points make the same transformers incremental in the Spark way:
  * every transformer stays a pure DataFrame => DataFrame, so `readStream →
  * transform → writeStream` is a drop-in (the §7.1 design goal).
  *
  * Scale notes: the windowed aggregation is a streaming state-store agg keyed
  * by (window, group) — partial aggregation happens map-side per micro-batch;
  * the watermark bounds state size by evicting windows older than the allowed
  * lateness. The SCD2 sink uses foreachBatch + the incremental merge, whose
  * shuffle is O(|micro-batch| + |touched keys|), never O(|dimension|).
  */
object Streams {

  /** File-source stream of event rows (parquet/json dir written append-only). */
  def readFileStream(spark: SparkSession, dir: String, schema: StructType,
      format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)

  /** Tumbling-window aggregation with watermark: per (window, groupCol) count
    * and exact decimal sum. The batch-equivalent query is
    * Queries.windowedAgg — streaming output over the same rows must match it
    * (asserted in StreamingSpec). */
  def windowedAgg(events: DataFrame, tsCol: String, groupCol: String,
      valueCol: String, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col(s"window.start").as("window_start"), col(groupCol),
        col("n_events"), col("sum_value"))

  /** Gap-based session aggregation via the native `session_window`: one row
    * per (key, session), where a session closes after `gap` of inactivity —
    * the streaming-native counterpart of [[graft.operators.Ops.sessionize]].
    * Semantics AGREE exactly: per-event windows [t, t+gap) merge when they
    * overlap or touch, so an event exactly `gap` after the previous one
    * still extends the session — the same strictly-greater break rule as
    * sessionize (asserted in StreamingSpec); bounds are start = first
    * event, end = last event + gap.
    * Works identically in batch (q75's oracle gate) and streaming (with the
    * watermark, append mode emits a session only once it can no longer
    * grow — StreamingSpec asserts stream ≡ batch).
    *
    * Scale shape: streaming session state is keyed by (key, window) in the
    * state store and merged incrementally as events extend a session; the
    * watermark evicts closed sessions, so state tracks ACTIVE sessions
    * only, not history. In batch it is one key shuffle + sort, same as the
    * window-function formulation. */
  def sessionAgg(events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
  }

  /** Streaming exact dedup: emit only the FIRST document bearing each
    * content fingerprint across the whole stream — the streaming skin of
    * [[graft.operators.Dedup.exact]] for continuous ingestion. State is
    * one flag per fingerprint in the keyed state store (partitioned by
    * fingerprint, checkpointed, restored across restarts); within a
    * micro-batch the lowest id wins so replays are deterministic.
    * Append-mode output: (fp, keep_id).
    *
    * Scale shape: the state store shards by the groupByKey hash exactly
    * like the batch groupBy shuffles — per-batch cost is the batch's
    * fingerprint footprint. State never expires (a dup must be caught
    * however late); bound memory by RocksDB state store on a cluster, or
    * add a timeout here if the dedup contract tolerates a horizon. */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docs.select(graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (fp, rows, state) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single((fp, rows.map(_._2).min)) }
      }.toDF("fp", "keep_id")
  }

  /** Watermarked stream-stream inner join: enrich each left event with
    * right events of the same key whose timestamp falls in
    * [left.ts − before, left.ts + after]. The time-bound condition is what
    * makes an unbounded-stream join finite: with both sides watermarked,
    * the state store can evict a buffered row once the other side's
    * watermark passes its join window — without the bound, state grows
    * forever and Spark rejects the query in append mode.
    *
    * Column convention: pass pre-renamed frames (no shared names besides
    * nothing — the key columns are named per side); the result carries
    * both sides' columns. Works identically in batch (same join condition,
    * no watermark) — StreamingSpec asserts stream ≡ batch.
    *
    * Scale shape: one hash shuffle per side on the key (the same exchange
    * a batch SMJ pays); state per key is bounded by the time bound × event
    * rate, evicted by watermark — the join never holds more than the
    * active window of either stream. */
  def intervalJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      before: String = "10 minutes", after: String = "10 minutes",
      watermark: String = "1 hour", how: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(how),
      s"intervalJoin supports inner | left_outer, got '$how'")
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    // left_outer: a left row with no right match within its time bound
    // emits null-padded ONCE the right watermark passes the bound — the
    // streaming answer to "which views never converted"; identical rows
    // to the batch left join, just delayed by watermark (StreamingSpec
    // asserts stream ≡ batch for both modes)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after"),
      how)
  }

  /** BOUNDED-state streaming dedup — the complement of [[dedupStream]]'s
    * never-expiring fingerprint state: `dropDuplicatesWithinWatermark`
    * keeps a fingerprint only until the watermark passes its arrival by
    * `delay`, so state is O(active window × rate) instead of O(corpus).
    * The contract weakens accordingly: a duplicate arriving AFTER the
    * window re-emits (use [[dedupStream]] on RocksDB when the corpus-
    * lifetime guarantee matters; this when it doesn't — e.g. at-least-
    * once upstream retries, which cluster in minutes). In batch the same
    * call degrades to plain exact dedup (one fingerprint groupBy).
    * Survivor choice within a window is arbitrary (Spark keeps the first
    * it processes) — key the assertions on fingerprints, not ids. */
  def dedupStreamBounded(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, delay: String = "1 hour"): DataFrame = {
    val keyed = docs.select(
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"),
      col(idCol).cast("long").as("id"), col(tsCol).as("ts"))
    if (docs.isStreaming)
      keyed.withWatermark("ts", delay).dropDuplicatesWithinWatermark("fp")
    else keyed.dropDuplicates("fp")
  }

  /** Stream into a [[graft.core.GraftTable]] with EXACTLY-ONCE appends:
    * foreachBatch is at-least-once, and a replayed micro-batch against a
    * plain file sink duplicates rows. Here each batch append goes through
    * [[graft.core.GraftTable.appendStream]], which records a per-stream
    * high-water batch id IN THE SAME manifest commit as the data — replay
    * of a committed batch is a no-op, and an attempt that crashed before
    * its manifest commit left only invisible orphans. The stream id
    * derives from the checkpoint path, so restarts keep their ledger.
    * Readers get snapshot isolation and time travel over the live stream
    * output for free. */
  def graftTableSink(events: DataFrame, path: String, checkpoint: String,
      statsCols: Seq[String] = Nil): DataStreamWriter[org.apache.spark.sql.Row] = {
    val streamId = "ckpt-" + java.util.UUID.nameUUIDFromBytes(
      checkpoint.getBytes("UTF-8")).toString.take(8)
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.core.GraftTable.appendStream(batch, path, streamId, id, statsCols): Unit
      }
  }

  /** Maintain a materialized rollup from an event stream, EXACTLY-ONCE
    * under micro-batch replays: foreachBatch is at-least-once, and a
    * replayed batch naively re-merged through
    * [[graft.core.TableIO.upsertAggregate]] would double-count its sums.
    * The sink therefore persists each micro-batch's PARTIAL aggregates at
    * (__batch_id, key) grain via the keyed upsert — a replay of batch N
    * REPLACES batch N's partial rows with identical values instead of
    * adding to them, so the table is idempotent under any replay
    * schedule. [[readRollup]] combines partials to key grain (the same
    * monoid combiners upsertAggregate merges with); [[compactRollup]]
    * folds history into one base partial per key off the write path so
    * read cost doesn't grow with batch count.
    *
    * Scale shape: each micro-batch collapses map-side to key grain before
    * touching storage; the upsert rewrites only that batch's rows. The
    * combining read is one exchange at (already aggregated) partial
    * grain. */
  def aggregateSink(events: DataFrame, path: String, keys: Seq[String],
      aggs: Seq[(String, String)], checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatchPartials(batch.sparkSession, path, batch, id, keys, aggs)
      }

  /** One micro-batch's idempotent partial merge (factored so StreamingSpec
    * can replay a batch id directly and assert nothing double-counts). */
  def mergeBatchPartials(spark: SparkSession, path: String, batch: DataFrame,
      batchId: Long, keys: Seq[String], aggs: Seq[(String, String)]): Unit = {
    val aggCols = TableIO.aggExprs(aggs)
    val partial = batch.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("__batch_id", lit(batchId))
    TableIO.upsertByKey(spark, path, partial, "__batch_id" +: keys)
  }

  /** Key-grain view over the partials table — the rollup consumers read. */
  def readRollup(spark: SparkSession, path: String, keys: Seq[String],
      aggs: Seq[(String, String)]): DataFrame = {
    val combine = TableIO.combineExprs(aggs)
    TableIO.read(spark, path).groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Fold all partials into one base row per key (batch id −1), keeping
    * reads O(|keys|) however many micro-batches have landed. Precondition:
    * run QUIESCED — stream stopped with its last batch committed to the
    * checkpoint (the same single-writer rule as every TableIO maintenance
    * op). A batch can only be replayed when its commit never landed, and a
    * committed batch is never replayed, so folding committed partials is
    * safe; folding an UNCOMMITTED batch's partials and then replaying it
    * would double-count — hence the quiesce rule (StreamingSpec's restart
    * case exercises exactly this order). */
  def compactRollup(spark: SparkSession, path: String, keys: Seq[String],
      aggs: Seq[(String, String)]): Unit = {
    val folded = readRollup(spark, path, keys, aggs)
      .withColumn("__batch_id", lit(-1L))
      .select(TableIO.read(spark, path).columns.map(col): _*)
      .localCheckpoint(true) // pinned before the swap changes the files it read
    TableIO.overwriteAtomic(folded, path)
  }

  /** Maintain an SCD2 dimension from a CDC event stream: each micro-batch is
    * merged through the same Scd2.merge the batch path uses, persisted with
    * the atomic upsert writer. `Trigger.AvailableNow` makes this the
    * incremental-batch runner; a processing-time trigger makes it continuous. */
  def scd2Sink(events: DataFrame, cfg: Scd2Config, dimPath: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // Scd2.merge references its delta 4+ times (skew guard, anchor
        // semi-join, untouched-key anti-join, the delta rows themselves):
        // cache the micro-batch once instead of re-deriving the stream
        // decode per reference (within-batch reuse, freed before the
        // next batch)
        val batch = batch0.persist()
        try {
          val spark = batch.sparkSession
          val existing = TableIO.readOrEmpty(spark, dimPath,
            Scd2.fromHistory(batch.limit(0), cfg))
          val merged = Scd2.merge(existing, batch, cfg)
          TableIO.overwriteAtomic(merged, dimPath)
        } finally batch.unpersist(): Unit
      }
}
