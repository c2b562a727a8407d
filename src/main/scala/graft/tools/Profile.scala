package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, d)
    // library-identical two-step shingle pipeline
    def shNew = docs.select(col("doc_id").as("id"), tokens(col("text")).as("__t"))
      .select(col("id"), shinglesOfTokens(col("__t"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles 2-step (1st)")(shNew.count())
    time("shingles 2-step (2nd)")(shNew.count())
    val inv = shNew.select(col("id"), explode(col("sh")).as("shingle"))
    time("explode inv")(inv.count())
    val inter = inv.select(col("shingle"), col("id").as("id_a"))
      .join(inv.select(col("shingle"), col("id").as("id_b")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("inter self-join+group")(inter.count())
    val sizes = shNew.select(col("id"), size(col("sh")).as("sz"))
    val joined = inter
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), Seq("id_b"))
    time("sizes joins")(joined.count())
    time("full q26")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1, 1000).count())
    time("full q26 again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1, 1000).count())
    time("full q24")(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.05).count())
    spark.stop()
  }
}
