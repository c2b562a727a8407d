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
  */
case class Scd2Config(
    businessKey: Seq[String],
    effectiveCol: String,
    hashCol: String = "row_hash",
    opCol: Option[String] = None,
    payload: Seq[String] = Nil,
    tiebreak: Seq[String] = Nil)

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

  private def orderCols(cfg: Scd2Config): Seq[Column] =
    col("__eff") +: cfg.tiebreak.map(c => col("__tb_" + c))

  /** Build a complete SCD2 dimension from full change history (batch path —
    * also the semantic spec the incremental path must converge to). */
  def fromHistory(events: DataFrame, cfg: Scd2Config, skCol: String = "sk"): DataFrame = {
    val prepared = events
      .withColumn("__eff", col(cfg.effectiveCol).cast("timestamp"))
      .withColumn("__op", cfg.opCol.map(col).getOrElse(lit("I")))
      .transform(d => cfg.tiebreak.foldLeft(d)((acc, c) => acc.withColumn("__tb_" + c, col(c))))
    finalize_(suppressNoOps(prepared, cfg), cfg, skCol, baseVersion = lit(1))
  }

  /** Incremental merge (steady-state path, reference E2): current rows of
    * touched keys + HWM-filtered delta → replacement rows for those keys.
    * Returns ONLY the rows to upsert (keyed by business key + version_no);
    * untouched keys never enter the plan. */
  def mergeDelta(existing: DataFrame, delta: DataFrame, cfg: Scd2Config, skCol: String = "sk"): DataFrame = {
    val keys = cfg.businessKey
    // current row per touched key (max version), semi-join pruned (SURVEY P9/J4)
    val wCur = Window.partitionBy(keys.map(col): _*).orderBy(col("version_no").desc)
    val current = existing
      .join(delta.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .withColumn("__rn", row_number().over(wCur)).filter(col("__rn") === 1).drop("__rn")
      .withColumn("__eff", col("effective_date").cast("timestamp"))
      // a deleted current row keeps op 'D' so a same-hash re-insert revives it
      .withColumn("__op", when(col("is_active") === "D", lit("D")).otherwise(lit("I")))
      .withColumn("__anchor", lit(true))
      .transform(d => cfg.tiebreak.foldLeft(d)((acc, c) =>
        acc.withColumn("__tb_" + c,
          lit(null).cast(delta.schema(c).dataType))))
      .select((keys ++ Seq(cfg.hashCol) ++ cfg.payload).map(col) ++
        Seq(col("__eff"), col("__op"), col("__anchor"), col("version_no").as("__base_v")) ++
        cfg.tiebreak.map(c => col("__tb_" + c)): _*)

    val deltaPrep = delta
      .withColumn("__eff", col(cfg.effectiveCol).cast("timestamp"))
      .withColumn("__op", cfg.opCol.map(col).getOrElse(lit("I")))
      .withColumn("__anchor", lit(false))
      .withColumn("__base_v", lit(null).cast("int"))
      .transform(d => cfg.tiebreak.foldLeft(d)((acc, c) => acc.withColumn("__tb_" + c, col(c))))
      .select(current.columns.map(col): _*)

    val combined = suppressNoOps(current.unionByName(deltaPrep), cfg)
    val wKey = Window.partitionBy(keys.map(col): _*)
    val withBase = combined.withColumn("__basev", max(col("__base_v")).over(wKey))
    // base+rn-1: anchor row (rn=1) keeps its version; new keys get rn.
    finalize_(withBase, cfg, skCol, baseVersion = coalesce(col("__basev"), lit(1)))
  }

  /** Convenience: merge and return the full resulting dimension. */
  def merge(existing: DataFrame, delta: DataFrame, cfg: Scd2Config, skCol: String = "sk"): DataFrame = {
    if (existing.isEmpty) fromHistory(delta, cfg, skCol)
    else {
      val changed = mergeDelta(existing, delta, cfg, skCol)
      // upsert grain is (business key, version_no) ≡ the surrogate key:
      // historical versions of touched keys are preserved, the rewritten
      // current version is replaced, new versions are appended (SURVEY S4).
      val upsertKeys = cfg.businessKey :+ "version_no"
      // reselect after the using-column join: left_anti with a key Seq moves
      // the keys to the front, which would silently reorder the dim schema
      val untouched = existing.join(changed.select(upsertKeys.map(col): _*).distinct(),
        upsertKeys, "left_anti").select(existing.columns.map(col): _*)
      untouched.unionByName(changed.select(untouched.columns.map(col): _*))
    }
  }

  /** dbt-style timestamp-strategy snapshot (SURVEY S11/E3, reference
    * snapshots/snapshot_employee.sql:4-9): same hash-diff change detection as
    * the dims, but snapshot conventions — `dbt_valid_from` is the observed
    * event time (no 1900 forcing), open versions carry NULL `dbt_valid_to`,
    * and the row id hashes key + updated_at (with the reference's B6 literal-
    * string bug fixed: we hash the column, not its name). */
  def snapshot(events: DataFrame, cfg: Scd2Config, skCol: String = "dbt_scd_id"): DataFrame = {
    val prepared = events
      .withColumn("__eff", col(cfg.effectiveCol).cast("timestamp"))
      .withColumn("__op", cfg.opCol.map(col).getOrElse(lit("I")))
      .transform(d => cfg.tiebreak.foldLeft(d)((acc, c) => acc.withColumn("__tb_" + c, col(c))))
    val keys = cfg.businessKey
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols(cfg): _*)
    suppressNoOps(prepared, cfg)
      .withColumn("dbt_valid_from", col("__eff"))
      .withColumn("dbt_valid_to", lead(col("__eff"), 1).over(w))
      .withColumn(skCol, temporalSk(keys.map(col), col("__eff")))
      .select((Seq(skCol) ++ keys ++ cfg.payload ++
        Seq(cfg.hashCol, "dbt_valid_from", "dbt_valid_to")).map(col): _*)
  }

  /** Drop rows whose tracked hash equals the previous version's hash —
    * UPD_IND='X' no-op suppression (dim_customer.sql:119-124,166). Anchor
    * (existing current) rows are never dropped: they carry version state. */
  private def suppressNoOps(df: DataFrame, cfg: Scd2Config): DataFrame = {
    val w = Window.partitionBy(cfg.businessKey.map(col): _*).orderBy(orderCols(cfg): _*)
    val anchor = if (df.columns.contains("__anchor")) col("__anchor") else lit(false)
    df.withColumn("__prev_hash", lag(col(cfg.hashCol), 1).over(w))
      .withColumn("__prev_op", lag(col("__op"), 1).over(w))
      .filter(anchor ||
        col("__prev_hash").isNull ||
        col("__prev_hash") =!= col(cfg.hashCol) ||
        col("__op") =!= coalesce(col("__prev_op"), lit("I")))
      .drop("__prev_hash", "__prev_op")
  }

  /** Window finalization: version numbers, activity flags, interval chain, SK. */
  private def finalize_(df: DataFrame, cfg: Scd2Config, skCol: String,
      baseVersion: Column): DataFrame = {
    val keys = cfg.businessKey
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols(cfg): _*)
    val out = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("version_no", (baseVersion + col("__rn") - 1).cast("int"))
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
