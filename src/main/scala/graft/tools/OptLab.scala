package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      case "q67" => q67(spark, d)
      case "pq" => pq(spark, d)
      case "commit" => commitCostE2e(spark, d)
      case other => sys.error(s"unknown experiment $other")
    }
    spark.stop()
  }

  /** End-to-end cost of ONE tiny GraftTable commit (the fixed cost every
    * DML/maintenance query pays per micro-commit): overwrite, append,
    * upsert and deleteByKey of a 1k-row frame, timed warm, plus the same
    * frame through a bare parquet write for the Spark-floor comparison. */
  private def commitCostE2e(spark: SparkSession, d: String): Unit = {
    import graft.core.GraftTable
    val root = java.nio.file.Files.createTempDirectory("graft_ccl").toString
    val df100 = spark.range(1000).select(col("id").cast("long").as("k"),
      (col("id") * 7).cast("double").as("v"))
    // warm
    GraftTable.overwrite(df100, s"$root/warm")
    for (i <- 1 to 3) {
      time(s"run$i bare parquet write") {
        df100.write.mode("overwrite").parquet(s"$root/bare$i")
      }
      time(s"run$i overwrite") { GraftTable.overwrite(df100, s"$root/t$i"): Unit }
      time(s"run$i append") { GraftTable.append(df100, s"$root/t$i"): Unit }
      time(s"run$i upsertByKey") {
        GraftTable.upsertByKey(spark, s"$root/t$i",
          df100.filter(col("k") < 100), Seq("k")): Unit
      }
      time(s"run$i deleteByKey") {
        GraftTable.deleteByKey(spark, s"$root/t$i",
          df100.filter(col("k") < 50).select("k"), Seq("k")): Unit
      }
    }
  }

  /** Decompose the IVFPQ encode (q60/q95's hot stage): replicate the
    * ivfPqTopK expressions piecewise and time each layer with a noop sink
    * so the 18 ms/row cost can be attributed (quantize HOF vs list argmin
    * vs per-subspace code argmins vs the join+window tail). */
  private def pq(spark: SparkSession, d: String): Unit = {
    import graft.operators.{Cluster, Similarity}
    val (nlist, m, ksub) = (16, 8, 16)
    val emb = graft.sources.Tables.embeddings(spark, d)
    val nSeeds = math.max(nlist, ksub)
    val seeds: Array[Array[Double]] = emb.orderBy(col("vec_id")).limit(nSeeds)
      .select(Cluster.quantize(col("embedding"))).collect()
      .map(_.getSeq[Double](0).toArray)
    val dims = seeds(0).length
    val sub = dims / m
    val cents = seeds.take(nlist)
    val cw = Array.tabulate(m, ksub)((s, c) => seeds(c).slice(s * sub, (s + 1) * sub))
    def litArr(a: Array[Double]): Column = array(a.map(lit): _*)
    def l2(v: Column, vv: Column, w: Array[Double]): Column =
      vv - lit(2.0) * Similarity.dot(v, litArr(w)) + lit(w.foldLeft(0.0)((a, x) => a + x * x))
    def ranked(v: Column, vv: Column, table: Array[Array[Double]]): Column =
      sort_array(array(table.indices.map(j =>
        struct(l2(v, vv, table(j)).as("d"), lit(j).as("j"))): _*))
    def argmin(v: Column, vv: Column, table: Array[Array[Double]]): Column =
      element_at(ranked(v, vv, table), 1).getField("j")
    def argminMin(v: Column, vv: Column, table: Array[Array[Double]]): Column =
      array_min(array(table.indices.map(j =>
        struct(l2(v, vv, table(j)).as("d"), lit(j).as("j"))): _*)).getField("j")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    graft.SparkEntry.queries("q60_pq_ann")(spark, "/root/testdata/sf0.001").count(): Unit
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val vq = emb.select(col("vec_id").as("neighbor_id"),
        Cluster.quantize(graft.operators.Similarity.toDouble(col("embedding"))).as("__vq"))
        .persist()
      time(s"run$i vq materialize") { vq.count(): Unit }
      time(s"run$i +vv only") {
        noop(vq.withColumn("__vv", Similarity.dot(col("__vq"), col("__vq"))))
      }
      time(s"run$i list argmin (sort_array)") {
        noop(vq.withColumn("__vv", Similarity.dot(col("__vq"), col("__vq")))
          .select(col("neighbor_id"), argmin(col("__vq"), col("__vv"), cents).as("list_id")))
      }
      time(s"run$i list argmin (array_min)") {
        noop(vq.withColumn("__vv", Similarity.dot(col("__vq"), col("__vq")))
          .select(col("neighbor_id"), argminMin(col("__vq"), col("__vv"), cents).as("list_id")))
      }
      time(s"run$i codes only (8 subspace argmins)") {
        noop(vq.select(col("neighbor_id"), array((0 until m).map { s =>
          val sv = slice(col("__vq"), s * sub + 1, sub)
          argmin(sv, Similarity.dot(sv, sv), cw(s))
        }: _*).as("__codes")))
      }
      time(s"run$i codes only (array_min)") {
        noop(vq.select(col("neighbor_id"), array((0 until m).map { s =>
          val sv = slice(col("__vq"), s * sub + 1, sub)
          argminMin(sv, Similarity.dot(sv, sv), cw(s))
        }: _*).as("__codes")))
      }
      time(s"run$i full encode") {
        noop(vq.withColumn("__vv", Similarity.dot(col("__vq"), col("__vq")))
          .select(col("neighbor_id"),
            argmin(col("__vq"), col("__vv"), cents).as("list_id"),
            array((0 until m).map { s =>
              val sv = slice(col("__vq"), s * sub + 1, sub)
              argmin(sv, Similarity.dot(sv, sv), cw(s))
            }: _*).as("__codes")))
      }
      val dtabs = (0 until m).map { s =>
        val sv = slice(col("__qq"), s * sub + 1, sub)
        array(cw(s).indices.map(c => l2(sv, Similarity.dot(sv, sv), cw(s)(c))): _*).as(s"__dt$s")
      }
      val probes = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), Cluster.quantize(
          Similarity.toDouble(col("embedding"))).as("__qq"))
        .withColumn("__qv", Similarity.dot(col("__qq"), col("__qq")))
        .select(col("query_id") +:
          explode(slice(ranked(col("__qq"), col("__qv"), cents), 1, 4)).as("__l") +:
          dtabs: _*)
        .withColumn("list_id", col("__l").getField("j")).drop("__l")
      time(s"run$i probes noop") { noop(probes) }
      val encoded = vq.withColumn("__vv", Similarity.dot(col("__vq"), col("__vq")))
        .select(col("neighbor_id"),
          argmin(col("__vq"), col("__vv"), cents).as("list_id"),
          array((0 until m).map { s =>
            val sv = slice(col("__vq"), s * sub + 1, sub)
            argmin(sv, Similarity.dot(sv, sv), cw(s))
          }: _*).as("__codes"))
      val adc = (0 until m)
        .map(s => element_at(col(s"__dt$s"), col("__codes").getItem(s) + 1))
        .reduce(_ + _)
      val pairs = broadcast(probes).join(encoded, Seq("list_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), adc.cast("long").as("adc"))
      time(s"run$i pairs count") { println(s"[lab]   n_pairs=${pairs.count()}") }
      val joined = broadcast(probes).join(encoded, Seq("list_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
      time(s"run$i join+codes only") {
        noop(joined.select(col("query_id"), col("neighbor_id"), col("__codes")))
      }
      time(s"run$i join+one dtab") {
        noop(joined.select(col("query_id"), col("neighbor_id"), col("__dt0")))
      }
      time(s"run$i join+one element_at") {
        noop(joined.select(col("query_id"), col("neighbor_id"),
          element_at(col("__dt0"), col("__codes").getItem(0) + 1).as("a0")))
      }
      time(s"run$i pairs noop") { noop(pairs) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
      time(s"run$i byAdc noop") {
        noop(pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5))
      }
      vq.unpersist()
      spark.catalog.clearCache()
      time(s"run$i q60 end-to-end") {
        graft.SparkEntry.queries("q60_pq_ann")(spark, d).count(): Unit
      }
    }
  }

  /** Decompose q67 (Corpus.refine): which sub-operator owns the CPU —
    * qualityFilter (HOF heuristics), the fingerprint dedup, decontaminate
    * (8-gram shingles vs probe set), or splitAssign. */
  private def q67(spark: SparkSession, d: String): Unit = {
    import graft.operators.{Corpus, Ops}
    import graft.functions.TextFunctions
    graft.SparkEntry.queries("q67_corpus_refine")(spark, "/root/testdata/sf0.001").count(): Unit
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val docs = graft.sources.Tables.documents(spark, d)
      val base = Ops.spread(docs.select(col("doc_id"), col("text"))).persist()
      time(s"run$i base materialize") { base.count(): Unit }
      time(s"run$i qualityFilter") {
        Corpus.qualityFilter(base, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      time(s"run$i fingerprint") {
        base.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("__fp"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"run$i decontaminate") {
        Corpus.decontaminate(base, "doc_id", "text",
          docs.filter(col("doc_id") < 5), "text", n = 8).unpersist()
      }
      time(s"run$i splitAssign") {
        Corpus.splitAssign(base.select(col("doc_id")), "doc_id", seed = "graft")
          .write.format("noop").mode("overwrite").save()
      }
      base.unpersist()
      spark.catalog.clearCache()
      time(s"run$i q67 end-to-end") {
        graft.SparkEntry.queries("q67_corpus_refine")(spark, d).count(): Unit
      }
    }
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
