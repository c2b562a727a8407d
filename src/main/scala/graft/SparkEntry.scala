package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SqlFunctions._
import graft.functions.TextFunctions._
import graft.operators._
import graft.scd.{Scd2, Scd2Config}
import graft.sources.Tables

/** Driver contract: every operator from SURVEY §2 (plus the LLM-data-pipeline
  * extensions) exposed as a named query over the testdata tables, each with a
  * DuckDB oracle formulation in [[Queries.oracleSql]].
  *
  * Column names are aliased identically on both sides (the driver's compare
  * sorts columns by name before hashing). Timestamps leave query outputs as
  * epoch micros (BIGINT) — representation-stable across Spark parquet and
  * DuckDB. Doubles produced by aggregation are rounded on both sides.
  */
object SparkEntry {

  /** Flagship query (sf0.001 smoke): star-join revenue rollup. */
  def entry(spark: SparkSession): DataFrame =
    Queries.starJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
