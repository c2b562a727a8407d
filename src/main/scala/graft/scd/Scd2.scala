package graft.scd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SqlFunctions._

/** Configuration for one SCD Type-2 dimension.
  *
  * @param businessKey natural-key columns
  * @param effectiveCol event-time column on the delta (becomes effective_date)
  * @param hashCol change-detection hash column (rowHash of tracked columns)
  * @param opCol optional CDC op column ('I'|'U'|'D'); 'D' produces is_active='D'
  * @param payload attribute columns carried onto the dimension
  * @param tiebreak extra ordering columns to make same-timestamp events deterministic
  * @param maxKeyRows HOT-KEY GUARD: when set, every merge first probes the
  *   delta's per-key event counts (one column-pruned, map-side-combined
  *   job — shuffle traffic is distinct keys, not rows) and REFUSES
  *   LOUDLY, naming the offending key(s), if any single business key
  *   exceeds this many events. The SCD2 window is
  *   `partitionBy(businessKey)`: one pathological key (a dummy member 0
  *   on a malformed feed) serializes its whole chain into ONE task — at
  *   100 TB that is a silent 100x straggler. A key with millions of
  *   HWM-new events in one batch is a data-quality failure to surface,
  *   not to grind through. None (default) skips the probe entirely.
  */
case class Scd2Config(
    businessKey: Seq[String],
    effectiveCol: String,
    hashCol: String = "row_hash",
    opCol: Option[String] = None,
    payload: Seq[String] = Nil,
    tiebreak: Seq[String] = Nil,
    maxKeyRows: Option[Long] = None)

/** Generic SCD Type-2 maintenance — ONE implementation of the 4-CTE
  * window algorithm every reference dim repeats
  * (/root/reference/models/dwh/dim_customer.sql:57-167, dim_products.sql,
  * dim_employee.sql, dim_shipper.sql — SURVEY §2.5):
  *
  *   - hash-diff change detection via lag(row_hash)      (dim_customer.sql:119-124)
  *   - version_no via first_value(version_no)+row_number (dim_customer.sql:151-158)
  *   - is_active 'Y'/'N'/'D' via lead(effective_date)    (dim_customer.sql:146-150)
  *   - first version's effective_date forced to 1900-01-01 (dim_customer.sql:159-163)
  *   - expiry_date = coalesce(lead(effective_date), 3001-01-01) (dim_customer.sql:164)
  *   - surrogate key md5(business_key || effective_date) (dim_customer.sql:75)
  *
  * Divergence from the reference (documented): the SK is computed from the
  * FINAL effective_date (post-1900 forcing), so the key-0 dummy member and a
  * key's first version use the same convention.
  *
  * Scale: the whole algorithm is one shuffle on the business key (the window),
  * then narrow ops. At 100 TB the delta is HWM-filtered long before this point
  * (SURVEY C1), and the existing-side scan is semi-join-pruned to touched keys,
  * so the window input is O(|delta|), not O(|dimension|).
  */
object Scd2 {

  private val MetaCols = Seq("version_no", "is_active", "effective_date", "expiry_date")

  /** Version ordering: event time, then (in the merge path) established
    * anchor versions before same-instant delta events, then the caller's
    * tiebreak columns. */
  private def orderCols(cfg: Scd2Config, df: DataFrame): Seq[Column] =
    (col("__eff") +:
      (if (df.columns.contains("__av")) Seq(col("__av").asc_nulls_last) else Nil)) ++
      cfg.tiebreak.map(c => col("__tb_" + c))

  /** Build a complete SCD2 dimension from full change history (batch path —
    * also the semantic spec the incremental path must converge to). */
  /** Per-key event counts of the heaviest business keys — the pre-merge
    * skew histogram. One job: column-pruned to the key columns, partial
    * (map-side) aggregation collapses each partition to its distinct
    * keys before the shuffle, so a 10⁶-row single-key delta ships ~1
    * tuple per input partition, not 10⁶ rows. */
  def skewTopKeys(df: DataFrame, cfg: Scd2Config, topN: Int = 5): Seq[(Seq[String], Long)] =
    df.groupBy(cfg.businessKey.map(col): _*).count()
      .orderBy(col("count").desc).limit(topN).collect()
      .map(r => (cfg.businessKey.indices.map(i => String.valueOf(r.get(i))),
        r.getAs[Long]("count"))).toSeq

  /** The loud hot-key guard behind [[Scd2Config.maxKeyRows]]: refuses a
    * delta whose heaviest key would serialize the merge window into one
    * pathological task, naming the key and its count. No-op (zero jobs)
    * when the threshold is unset. */
  private def skewGuard(df: DataFrame, cfg: Scd2Config): Unit =
    cfg.maxKeyRows.foreach { cap =>
      val hot = skewTopKeys(df, cfg, topN = 3).filter(_._2 > cap)
      if (hot.nonEmpty)
        throw new IllegalArgumentException(
          s"SCD2 hot-key guard: business key(s) ${hot.map { case (k, n) =>
            s"(${cfg.businessKey.zip(k).map { case (c, v) => s"$c=$v" }.mkString(", ")}) x$n"
          }.mkString("; ")} exceed maxKeyRows=$cap — the merge window is " +
            "partitionBy(businessKey), so one hot key serializes into a single " +
            "task. This is usually a malformed feed (dummy/default key); fix " +
            "the feed, pre-aggregate the key, or raise maxKeyRows deliberately")
    }

  def fromHistory(events: DataFrame, cfg: Scd2Config, skCol: String = "sk"): DataFrame = {
    skewGuard(events, cfg)
    val prepared = events
      .withColumn("__eff", col(cfg.effectiveCol).cast("timestamp"))
      .withColumn("__op", cfg.opCol.map(col).getOrElse(lit("I")))
      .transform(d => cfg.tiebreak.foldLeft(d)((acc, c) => acc.withColumn("__tb_" + c, col(c))))
    finalize_(suppressNoOps(prepared, cfg), cfg, skCol)
  }

  /** Incremental merge (steady-state path, reference E2): rebuilds the FULL
    * version chain of every touched key from its persisted versions replayed
    * as events plus the HWM-filtered delta, running the identical window
    * algorithm as [[fromHistory]] — so merge ≡ fromHistory by construction,
    * including late (out-of-order event-time) deltas that interleave between
    * existing versions or render an existing version a no-op. Untouched keys
    * never enter the plan; cost is O(|delta| + |versions of touched keys|).
    *
    * Convergence caveats (documented, property-tested):
    *  - a key's first version stores `effective_date = 1900-01-01`, losing
    *    its original event time, so a later delta with an event time EARLIER
    *    than the key's first-ever event cannot re-order against it;
    *  - at equal event time, established versions order before delta events;
    *    exact tiebreak parity across batch splits holds when the caller's
    *    tiebreak column is monotone with arrival order (e.g. an event id).
    */
  /** Touched keys' persisted versions (semi-join pruned, SURVEY P9/J4)
    * projected back to event form: `effRaw`/`opRaw`/`orderRaw` supply the
    * replayed __eff/__op/__av from whichever columns the persisted table
    * carries (dim vs snapshot conventions). */
  private def replayAnchors(existing: DataFrame, delta: DataFrame, cfg: Scd2Config,
      effRaw: Column, opRaw: Column, orderRaw: Column): DataFrame =
    existing
      .join(delta.select(cfg.businessKey.map(col): _*).distinct(), cfg.businessKey, "left_semi")
      .select((cfg.businessKey ++ cfg.payload :+ cfg.hashCol).map(col) ++ Seq(
        effRaw.cast("timestamp").as("__eff"), opRaw.as("__op"), orderRaw.as("__av")) ++
        cfg.tiebreak.map(c => lit(null).cast(delta.schema(c).dataType).as("__tb_" + c)): _*)

  private def prepDelta(delta: DataFrame, cfg: Scd2Config, like: DataFrame): DataFrame =
    delta
      .withColumn("__eff", col(cfg.effectiveCol).cast("timestamp"))
      .withColumn("__op", cfg.opCol.map(col).getOrElse(lit("I")))
      .withColumn("__av", lit(null).cast("int"))
      .transform(d => cfg.tiebreak.foldLeft(d)((acc, c) => acc.withColumn("__tb_" + c, col(c))))
      .select(like.columns.map(col): _*)

  /** Key-grain upsert: touched keys' rebuilt chains replace their versions
    * wholesale, untouched keys are kept as-is (SURVEY S4). Reselect after
    * the using-column join: left_anti with a key Seq moves the keys to the
    * front, which would reorder the schema. */
  private def keyedUnion(existing: DataFrame, delta: DataFrame, cfg: Scd2Config,
      changed: DataFrame): DataFrame = {
    val untouched = existing.join(delta.select(cfg.businessKey.map(col): _*).distinct(),
      cfg.businessKey, "left_anti").select(existing.columns.map(col): _*)
    untouched.unionByName(changed.select(untouched.columns.map(col): _*))
  }

  def mergeDelta(existing: DataFrame, delta: DataFrame, cfg: Scd2Config, skCol: String = "sk"): DataFrame = {
    skewGuard(delta, cfg)
    // 'D' versions replay as delete events so a same-hash re-insert still
    // revives the key via the op-flip check
    val anchors = replayAnchors(existing, delta, cfg,
      effRaw = col("effective_date"),
      opRaw = when(col("is_active") === "D", lit("D")).otherwise(lit("I")),
      orderRaw = col("version_no"))
    finalize_(suppressNoOps(anchors.unionByName(prepDelta(delta, cfg, anchors)), cfg), cfg, skCol)
  }

  /** Convenience: merge and return the full resulting dimension. No
    * emptiness probe is needed: with an empty `existing`, the anchors and
    * the untouched set are both empty and mergeDelta degenerates to
    * fromHistory(delta) — avoiding a driver-side job per merge.
    *
    * Schema contract: `existing` — even when empty — must carry the full
    * dimension schema this object produces (business key, payload, hash,
    * effective_date/expiry_date, is_active, version_no), because the anchors
    * projection references those columns. Use
    * `TableIO.readOrEmpty(..., like = fromHistory(delta.limit(0), cfg))`
    * for a first run, not `spark.emptyDataFrame`. */
  def merge(existing: DataFrame, delta: DataFrame, cfg: Scd2Config, skCol: String = "sk"): DataFrame =
    keyedUnion(existing, delta, cfg, mergeDelta(existing, delta, cfg, skCol))

  /** dbt-style timestamp-strategy snapshot (SURVEY S11/E3, reference
    * snapshots/snapshot_employee.sql:4-9): same hash-diff change detection as
    * the dims, but snapshot conventions — `dbt_valid_from` is the observed
    * event time (no 1900 forcing), open versions carry NULL `dbt_valid_to`,
    * and the row id hashes key + updated_at (with the reference's B6 literal-
    * string bug fixed: we hash the column, not its name). */
  def snapshot(events: DataFrame, cfg: Scd2Config, skCol: String = "dbt_scd_id"): DataFrame = {
    skewGuard(events, cfg)
    val prepared = events
      .withColumn("__eff", col(cfg.effectiveCol).cast("timestamp"))
      .withColumn("__op", cfg.opCol.map(col).getOrElse(lit("I")))
      .transform(d => cfg.tiebreak.foldLeft(d)((acc, c) => acc.withColumn("__tb_" + c, col(c))))
    snapFinalize(suppressNoOps(prepared, cfg), cfg, skCol)
  }

  /** Snapshot finalization: open-ended validity chain, no 1900 forcing, no
    * version numbers in the output (snapshot convention). */
  private def snapFinalize(df: DataFrame, cfg: Scd2Config, skCol: String): DataFrame = {
    val keys = cfg.businessKey
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols(cfg, df): _*)
    df.withColumn("dbt_valid_from", col("__eff"))
      .withColumn("dbt_valid_to", lead(col("__eff"), 1).over(w))
      .withColumn(skCol, temporalSk(keys.map(col), col("__eff")))
      .select((Seq(skCol) ++ keys ++ cfg.payload ++
        Seq(cfg.hashCol, "dbt_valid_from", "dbt_valid_to")).map(col): _*)
  }

  /** Incremental snapshot merge — the steady state of the reference's
    * `dbt snapshot` (snapshots/snapshot_employee.sql:4-9): like [[merge]]
    * but honoring snapshot conventions (`dbt_valid_from` keeps the observed
    * event time, open versions carry NULL `dbt_valid_to`). Touched keys'
    * chains are rebuilt from their persisted versions replayed as events
    * plus the delta — so snapshotMerge ≡ snapshot-over-history by
    * construction (the q37 oracle gates it); untouched keys never enter
    * the plan.
    *
    * Anchor replay order: snapshots emit no version_no, so the persisted
    * chain order is reconstructed as (dbt_valid_from, dbt_valid_to NULLS
    * LAST) — exact for same-instant version pairs because only the chain's
    * LAST same-instant version has an open/later valid_to, and earlier
    * same-instant versions are output-identical under any order (the
    * snapshot schema carries no version column).
    *
    * Convergence caveat (property-tested): no-op suppression is lossy — a
    * suppressed same-hash event leaves no trace in the persisted snapshot,
    * so a late delta whose event time interleaves BEFORE a suppressed
    * no-op cannot reproduce the one-batch chain (dbt snapshots behave
    * identically). Per-key-monotone deltas (the HWM steady state) converge
    * exactly; unlike [[mergeDelta]] there is no 1900-forcing caveat, since
    * snapshots keep every version's observed event time. */
  def snapshotMerge(existing: DataFrame, delta: DataFrame, cfg: Scd2Config,
      skCol: String = "dbt_scd_id"): DataFrame = {
    // the snapshot schema discards op, so replayed anchors cannot reproduce
    // op-flip suppression — reject configs that would silently diverge from
    // snapshot-over-history (dbt's timestamp strategy is op-less anyway)
    require(cfg.opCol.isEmpty,
      "snapshotMerge supports op-less (timestamp-strategy) configs only; " +
        "use merge for delete-aware dimensions")
    val anchors = replayAnchors(existing, delta, cfg,
      effRaw = col("dbt_valid_from"),
      opRaw = lit("I"),
      orderRaw = row_number().over(Window.partitionBy(cfg.businessKey.map(col): _*)
        .orderBy(col("dbt_valid_from"), col("dbt_valid_to").asc_nulls_last)))
    keyedUnion(existing, delta, cfg, snapFinalize(
      suppressNoOps(anchors.unionByName(prepDelta(delta, cfg, anchors)), cfg), cfg, skCol))
  }

  /** Drop rows whose tracked hash equals the previous version's hash —
    * UPD_IND='X' no-op suppression (dim_customer.sql:119-124,166). An op
    * flip at equal hash (delete, or re-insert after a delete) is a real
    * change and is kept. */
  private def suppressNoOps(df: DataFrame, cfg: Scd2Config): DataFrame = {
    val w = Window.partitionBy(cfg.businessKey.map(col): _*).orderBy(orderCols(cfg, df): _*)
    df.withColumn("__prev_hash", lag(col(cfg.hashCol), 1).over(w))
      .withColumn("__prev_op", lag(col("__op"), 1).over(w))
      .filter(
        col("__prev_hash").isNull ||
        col("__prev_hash") =!= col(cfg.hashCol) ||
        col("__op") =!= coalesce(col("__prev_op"), lit("I")))
      .drop("__prev_hash", "__prev_op")
  }

  /** Window finalization: version numbers, activity flags, interval chain, SK. */
  private def finalize_(df: DataFrame, cfg: Scd2Config, skCol: String): DataFrame = {
    val keys = cfg.businessKey
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols(cfg, df): _*)
    val out = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("version_no", col("__rn").cast("int"))
      .withColumn("__next_eff", lead(col("__eff"), 1).over(w))
      .withColumn("is_active",
        when(col("__op") === "D", lit("D"))
          .when(col("__next_eff").isNull, lit("Y"))
          .otherwise(lit("N")))
      .withColumn("effective_date",
        when(col("version_no") === 1, epochTs).otherwise(col("__eff")))
      .withColumn("expiry_date", coalesce(col("__next_eff"), futureTs))
      .withColumn(skCol, temporalSk(keys.map(col), col("effective_date")))
    out.select((Seq(skCol) ++ keys ++ cfg.payload ++ Seq(cfg.hashCol) ++ MetaCols).map(col): _*)
  }
}
