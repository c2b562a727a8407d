package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bronze-layer readers for the driver testdata star schema (TESTDATA.md).
  * One parquet file per table; scans are plain `spark.read.parquet` so
  * Catalyst's pushdown/pruning applies (SURVEY S1/S2).
  */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")

  /** `events.ts` is a nanosecond parquet timestamp, which vanilla Spark
    * refuses ([PARQUET_TYPE_ILLEGAL]). Read it as a long via the legacy
    * flag and normalize to microsecond TimestampType + an explicit
    * `ts_us` epoch-micros column (floor-division truncation — exactly what
    * DuckDB's ns→us read does, keeping both engines bit-identical). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    apply(s, d, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
