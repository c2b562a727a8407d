package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SqlFunctions._

/** Temporal / as-of joins (SURVEY J3): a fact row joins the dimension version
  * valid at its event time — `ON key = key AND ts BETWEEN effective_date AND
  * expiry_date` (/root/reference/models/dwh/fact_order.sql:37-42,
  * fact_order_details.sql:39-40).
  *
  * BETWEEN is inclusive on both ends, faithfully kept: a probe exactly at a
  * version flip matches two versions (reference behavior, SURVEY §7.5#4);
  * use `pointInTime` for the dedup'd half-open variant.
  *
  * Physical notes for 100 TB: the equi key drives a shuffle (or broadcast —
  * SCD2 dims are usually small relative to facts, so `broadcast(dim)` turns
  * this into a map-side join with the range as a residual filter). When the
  * dim is too big to broadcast, Catalyst plans SMJ on the key with the range
  * residual applied post-merge — still one shuffle each side, no cross
  * product, because the join has an equi component.
  */
object AsOf {

  /** Reference-faithful temporal left join (inclusive BETWEEN). */
  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      probeTs: Column, how: String = "left"): DataFrame = {
    val d = dim.alias("__dim")
    val f = fact.alias("__fact")
    f.join(d,
      col(s"__fact.$factKey") === col(s"__dim.$dimKey") &&
        probeTs.between(col("__dim.effective_date"), col("__dim.expiry_date")),
      how)
  }

  /** Half-open variant [effective, expiry): exactly one dim version per probe. */
  def pointInTime(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      probeTs: Column, how: String = "left"): DataFrame = {
    val d = dim.alias("__dim")
    val f = fact.alias("__fact")
    f.join(d,
      col(s"__fact.$factKey") === col(s"__dim.$dimKey") &&
        probeTs >= col("__dim.effective_date") && probeTs < col("__dim.expiry_date"),
      how)
  }

  /** SK resolution with the dummy-member fallback: failed lookups coalesce to
    * md5('0' || '-' || '1900-01-01 00:00:00') (fact_order.sql:17-19). */
  def resolveSk(skFromDim: Column): Column = coalesce(skFromDim, dummySk)

  /** Late-arriving-dimension repair (C7, macros/fact_order_fail_lookup.sql):
    * rows still carrying the dummy SK are re-resolved against the (now
    * updated) dimension; everything else passes through untouched. */
  def repairFailedLookups(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, probeTs: Column, skCol: String): DataFrame = {
    // null-safe split: a NULL sk (external writer, schema evolution) must be
    // repaired, not silently dropped by failing both filters
    val failed = fact.filter(col(skCol).isNull || col(skCol) === dummySk)
    val ok = fact.filter(col(skCol).isNotNull && col(skCol) =!= dummySk)
    val dimSel = dim.select(col(dimKey), col("effective_date"), col("expiry_date"), col("sk"))
    val repaired = pointInTime(failed.drop(skCol), dimSel, factKey, dimKey, probeTs)
      .select(ok.columns.map(c =>
        if (c == skCol) resolveSk(col("__dim.sk")).as(skCol) else col(s"__fact.$c")): _*)
    ok.unionByName(repaired)
  }
}
