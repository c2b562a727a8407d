package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** The quiesced per-query benchmark protocol — the [[CommitCost]]
  * measurement discipline applied to the whole query registry: N runs
  * per query (default 5) on an otherwise-idle machine, per-query MEDIAN
  * and SPREAD (min/max) written as a markdown table. The committed
  * table is the round-over-round reference that a single contended
  * driver run can't distort (round 8's official run was uniformly
  * ~1.44× a like-for-like re-run — machine load, but nothing committed
  * could prove it; this table is that proof for future rounds).
  *
  * Usage: `runMain graft.tools.BenchMedian <sfDir> <outFile> [runs] [q...]`
  * — trailing query names restrict the run (the isolated-measurement
  * mode used to attribute a single query's regression). */
object BenchMedian {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = args.lift(1).getOrElse("BENCH_MEDIANS.md")
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench warmup contract: JIT + codebook kernels compile untimed
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      Seq("q26_ngram_jaccard", "q10_scd2_history", "q02_star_join",
        "q60_pq_ann").foreach { q =>
        try SparkEntry.queries(q)(spark, warmDir).count(): Unit
        catch { case _: Throwable => () }
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(): Unit; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[median] $name failed: ${e.getMessage}")
          -1.0
        }
      }.sorted
      val median = if (times.head < 0) -1.0 else times(times.size / 2)
      System.err.println(f"[median] $name%-28s $median%8.3f s (min ${times.head}%.3f max ${times.last}%.3f)")
      (name, median, times.head, times.last)
    }
    val total = rows.map(_._2).filter(_ >= 0).sum
    val sb = new StringBuilder
    sb ++= s"# Quiesced per-query medians\n\n"
    sb ++= s"- data: `$sfDir`; runs per query: $runs (median reported); threads: $cpus\n"
    sb ++= f"- total of medians: $total%.1f s over ${rows.size} queries\n"
    sb ++= "- protocol: untimed JIT/codebook warmup, cache cleared between runs,\n"
    sb ++= "  failures read as -1 (never a fast time). Run quiesced: no other\n"
    sb ++= "  builds, benches, or test suites on the machine.\n\n"
    sb ++= "| query | median s | min s | max s |\n|---|---|---|---|\n"
    rows.foreach { case (n, med, lo, hi) =>
      sb ++= f"| $n | $med%.3f | $lo%.3f | $hi%.3f |\n"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes("UTF-8"))
    System.err.println(s"[median] wrote $outFile (${rows.size} queries, total ${math.round(total)} s)")
    spark.stop()
  }
}
