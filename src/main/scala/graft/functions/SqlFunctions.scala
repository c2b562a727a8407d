package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar helpers mirroring the reference's macro surface.
  *
  * `surrogateKey` reproduces `dbt_utils.generate_surrogate_key` as expanded by
  * the reference (see /root/reference/models/staging/stg_orders.sql:22-35 and
  * /root/reference/models/dwh/dim_customer.sql:75): MD5 over '-'-joined string
  * casts with NULL -> ''. Every input is coalesced BEFORE concat_ws so the
  * separator is always present (concat_ws would silently drop raw NULLs).
  *
  * All of these are compositions of built-in, codegen'd Catalyst expressions —
  * no UDFs — so they stay inside WholeStageCodegen at any scale.
  */
object SqlFunctions {

  /** Low interval sentinel (reference models/dwh/dim_customer.sql:146-164). */
  val EpochDate = "1900-01-01"

  /** High interval sentinel (reference models/dwh/dim_customer.sql:164). */
  val FutureDate = "3001-01-01"

  def epochTs: Column = to_timestamp(lit(EpochDate))
  def futureTs: Column = to_timestamp(lit(FutureDate))

  /** MD5 surrogate key: md5(concat_ws('-', coalesce(cast(c as string),'') ...)). */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(""))): _*).cast("binary"))

  /** Row change-detection hash — same recipe as the reference's row_hash
    * (stg_orders.sql:22-35 uses generate_surrogate_key for it too). */
  def rowHash(cols: Column*): Column = surrogateKey(cols: _*)

  /** Epoch micros of 1900-01-01T00:00Z — the low sentinel in SK hash inputs. */
  val EpochMicros: Long = -2208988800000000L

  /** Surrogate key over a business key + a timestamp: the timestamp enters the
    * hash as epoch MICROS, not as a string cast. Engine convention, diverging
    * from the reference's raw string-cast (SURVEY §7.5#2 calls ts-to-string
    * formatting the #1 cross-engine hash pitfall — epoch micros is
    * representation-stable across Spark, DuckDB, and any SQL oracle). */
  def temporalSk(keys: Seq[Column], ts: Column): Column =
    surrogateKey(keys :+ unix_micros(ts.cast("timestamp")): _*)

  /** The dummy surrogate key facts coalesce to on failed dimension lookups —
    * the SK of the key-0 "Not Found" dummy member
    * (reference models/dwh/fact_order.sql:17-19). */
  def dummySk: Column = surrogateKey(lit(0), lit(EpochMicros))

  /** Shared 32-bit hash: first 8 hex chars of md5 as an unsigned int.
    * Identical formula is expressible in any oracle SQL engine
    * (DuckDB: ('0x'||substr(md5(s),1,8))::BIGINT). */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
}
