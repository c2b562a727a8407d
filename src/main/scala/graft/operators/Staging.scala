package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SqlFunctions._

/** Staging normalization (SURVEY §2.1/§2.3, reference models/staging):
  * rename-projection to snake_case, type casts, and the CDC envelope every
  * staged row carries — `dl_process_date` (ingest timestamp), `op` flag
  * ('I'|'U'|'D'), and `row_hash` (MD5 of the tracked columns)
  * (/root/reference/models/staging/stg_orders.sql:6-35).
  *
  * Pure projection + scalar functions: no shuffle, fully codegen'd, and the
  * rename/cast projection prunes the parquet scan to exactly the consumed
  * columns (visible as ReadSchema in .explain).
  */
object Staging {

  /** Apply renames/casts, then stamp the CDC envelope. `hashCols` defines
    * which columns participate in change detection (a semantic choice — see
    * reference bug B4: columns omitted from the hash are invisible to SCD2). */
  def stage(df: DataFrame, projection: Seq[(String, Column)],
      hashCols: Seq[String], processTs: Column = current_timestamp(),
      op: Column = lit("I")): DataFrame = {
    val projected = df.select(projection.map { case (n, c) => c.as(n) }: _*)
    projected
      .withColumn("dl_process_date", processTs)
      .withColumn("op", op)
      .withColumn("row_hash", rowHash(hashCols.map(col): _*))
  }

  /** Identity-rename staging: keep column names, stamp the envelope. */
  def envelope(df: DataFrame, hashCols: Seq[String],
      processTs: Column = current_timestamp(), op: Column = lit("I")): DataFrame =
    stage(df, df.columns.toSeq.map(c => c -> col(c)), hashCols, processTs, op)
}
