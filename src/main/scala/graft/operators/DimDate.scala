package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated date dimension — replaces `dbt_date.get_date_dimension`
  * (/root/reference/models/dwh/dim_date.sql:1, spine 2020-01-01 → 2035-12-31,
  * 5,844 rows). Column contract is ours (SURVEY F16): a documented ~16-column
  * subset rather than a clone of the package.
  *
  * Generation is `sequence` + `explode` — one task, no shuffle; every derived
  * column is a built-in codegen'd function of date_day.
  */
object DimDate {

  def apply(spark: SparkSession, start: String = "2020-01-01",
      end: String = "2035-12-31"): DataFrame = {
    spark.range(1)
      .select(explode(sequence(to_date(lit(start)), to_date(lit(end)))).as("date_day"))
      .withColumn("year", year(col("date_day")).cast("int"))
      .withColumn("quarter", quarter(col("date_day")).cast("int"))
      .withColumn("month", month(col("date_day")).cast("int"))
      .withColumn("month_name", date_format(col("date_day"), "MMMM"))
      .withColumn("day_of_month", dayofmonth(col("date_day")).cast("int"))
      // ISO day of week: Monday=1..Sunday=7 (Spark dayofweek is Sunday=1)
      .withColumn("day_of_week_iso",
        (((dayofweek(col("date_day")) + lit(5)) % 7) + lit(1)).cast("int"))
      .withColumn("day_name", date_format(col("date_day"), "EEEE"))
      .withColumn("day_of_year", dayofyear(col("date_day")).cast("int"))
      .withColumn("week_of_year_iso", weekofyear(col("date_day")).cast("int"))
      .withColumn("first_day_of_month", trunc(col("date_day"), "MM"))
      .withColumn("last_day_of_month", last_day(col("date_day")))
      .withColumn("is_weekend", (((dayofweek(col("date_day")) + lit(5)) % 7) + lit(1)) >= 6)
      .withColumn("prior_year_date", add_months(col("date_day"), -12))
      .withColumn("next_year_date", add_months(col("date_day"), 12))
      .withColumn("is_leap_year",
        (col("year") % 4 === 0 && col("year") % 100 =!= 0) || col("year") % 400 === 0)
  }
}
