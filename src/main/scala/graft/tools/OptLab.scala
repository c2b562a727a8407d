package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment harness for optimization rounds (not part of the
  * driver contract): isolates pieces of the heavy queries so a change's
  * effect is measured on the operator itself, under the exact Bench
  * session confs. Experiments come and go between rounds — nothing here
  * is load-bearing.
  *
  *   runMain graft.tools.OptLab <experiment> [sfDir]
  */
object OptLab {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[lab] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val exp = args.headOption.getOrElse("q118")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    exp match {
      case "q118" => q118(spark, d)
      case "q118v2" => q118v2(spark, d)
      case "q170" => q170(spark, d)
      case other => sys.error(s"unknown experiment $other")
    }
    spark.stop()
  }

  /** Decompose q118: edge build vs pageRank iterations. */
  private def q118(spark: SparkSession, d: String): Unit = {
    // JIT warmup on the small SF, the Bench discipline
    graft.SparkEntry.queries("q118_pagerank")(spark, "/root/testdata/sf0.001").count(): Unit
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      val li = graft.sources.Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = time(s"run$i edge build (count)") {
        val e0 = graft.operators.Graph.basketEdges(li, "l_orderkey", "l_partkey",
          maxBasketItems = 64)
        e0.count()
        e0
      }
      time(s"run$i pageRank over edges") {
        graft.operators.Graph.pageRank(e, "src", "dst", iterations = 5,
          distinctEdges = true).count(): Unit
      }
      spark.catalog.clearCache()
      time(s"run$i q118 end-to-end") {
        graft.SparkEntry.queries("q118_pagerank")(spark, d).count(): Unit
      }
    }
  }

  /** A/B the dst-partitioned pageRank prototype against the shipped one:
    * exact result equality (sorted collect) and per-run timing. */
  private def q118v2(spark: SparkSession, d: String): Unit = {
    graft.SparkEntry.queries("q118_pagerank")(spark, "/root/testdata/sf0.001").count(): Unit
    def edges() = graft.operators.Graph.basketEdges(
      graft.sources.Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", maxBasketItems = 64)
    val a = graft.operators.Graph.pageRank(edges(), "src", "dst",
      iterations = 5, distinctEdges = true)
      .orderBy("node").collect().map(_.toString)
    val b = pageRankDst(edges(), 5, 0.85).orderBy("node").collect().map(_.toString)
    println(s"[lab] results equal: ${a.sameElements(b)} (${a.length} rows)")
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      time(s"run$i pageRank SHIPPED") {
        graft.operators.Graph.pageRank(edges(), "src", "dst",
          iterations = 5, distinctEdges = true).count(): Unit
      }
      spark.catalog.clearCache()
      time(s"run$i pageRank DST-PARTITIONED") { pageRankDst(edges(), 5, 0.85).count(): Unit }
    }
  }

  /** Prototype: identical arithmetic to Graph.pageRank, but the persisted
    * edge layout is keyed by dst so the per-iteration contribution
    * aggregation (groupBy dst) reuses the cached partitioning instead of
    * exchanging |E| rows per iteration; the rank frame is node-sized and
    * explicitly broadcast into the contribution join. */
  private def pageRankDst(edges: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(col("dst"))
      .dropDuplicates("src", "dst")
      .persist()
    val nd = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .join(e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg")),
        Seq("node"), "left")
      .na.fill(0L, Seq("out_deg"))
      .persist()
    try {
      val n = time("  setup nd.count") { nd.count() }
      var ranks = nd
        .select(col("node"), col("out_deg"),
          lit(1.0 / n).cast("decimal(24,12)").as("rank"))
        .persist()
      time("  setup ranks.count") { ranks.count(): Unit }
      val base = (1.0 - damping) / n
      val hasDangling = time("  setup dangling probe") {
        nd.filter(col("out_deg") === 0).limit(1).count() > 0 }
      for (it <- 1 to iterations) time(s"  iteration $it") {
        val contrib = e
          .join(broadcast(ranks.select(col("node").as("src"), col("rank"), col("out_deg"))),
            Seq("src"))
          .select(col("dst").as("node"),
            (col("rank").cast("double") / col("out_deg"))
              .cast("decimal(24,12)").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
        val joined = nd.join(contrib, Seq("node"), "left")
        val withDang =
          if (!hasDangling) joined.withColumn("__dang_over_n", lit(0.0))
          else joined.crossJoin(broadcast(
            ranks.filter(col("out_deg") === 0).agg(
              (coalesce(sum(col("rank")).cast("double"), lit(0.0)) / lit(n.toDouble))
                .as("__dang_over_n"))))
        val next = withDang
          .select(col("node"), col("out_deg"),
            (lit(base) + lit(damping) *
              (coalesce(col("contrib").cast("double"), lit(0.0)) + col("__dang_over_n")))
              .cast("decimal(24,12)").as("rank"))
          .persist()
        next.count(): Unit
        val old = ranks; ranks = next; old.unpersist(): Unit
      }
      val out = ranks.select(col("node"), col("out_deg"),
        round(col("rank").cast("double"), 6).as("rank")).persist()
      time("  finalize out.count") { out.count(): Unit }
      ranks.unpersist(): Unit
      out
    } finally { e.unpersist(): Unit; nd.unpersist(): Unit }
  }

  /** Decompose q170: key collect vs probeHashes vs pruned join. */
  private def q170(spark: SparkSession, d: String): Unit = {
    graft.SparkEntry.queries("q170_dynamic_prune")(spark, d).count(): Unit // build fixture
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      time(s"run$i q170 end-to-end") {
        graft.SparkEntry.queries("q170_dynamic_prune")(spark, d).count(): Unit
      }
      val dim = graft.sources.Tables.orders(spark, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
        .select(col("o_orderkey"))
      val keys = time(s"run$i dim key collect") {
        dim.na.drop().distinct().limit(1000001).collect().map(_.get(0)).toSeq
      }
      println(s"[lab] run$i key count: ${keys.size}")
      // same fixture root the query uses (package-private, no reflection)
      val path = graft.Queries.q170Root + "/lineitem_f"
      val scan = time(s"run$i readPrunedByKeys") {
        graft.core.GraftTable.readPrunedByKeys(spark, path, "l_orderkey",
          dim.select(col("o_orderkey")))
      }
      println(s"[lab] run$i planned ${scan.filesRead}/${scan.filesTotal} files")
      time(s"run$i pruned join+agg") {
        val dim2 = graft.sources.Tables.orders(spark, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        scan.df.join(broadcast(dim2), scan.df("l_orderkey") === dim2("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_items")).count(): Unit
      }
      // does the GraftPrune extension rule change the cost once installed?
      if (i == 3) {
        graft.plans.GraftPrune.install(spark)
        spark.catalog.clearCache()
        time("run3b q170 end-to-end WITH RULE") {
          graft.SparkEntry.queries("q170_dynamic_prune")(spark, d).count(): Unit
        }
        time("run3c q170 end-to-end WITH RULE") {
          graft.SparkEntry.queries("q170_dynamic_prune")(spark, d).count(): Unit
        }
      }
    }
  }
}
