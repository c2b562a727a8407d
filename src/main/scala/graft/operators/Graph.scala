package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge lists. A training-data pipeline uses link
  * centrality as a document-quality prior (the Common-Crawl lineage:
  * harmonic/PageRank centrality of the source host weights the crawl);
  * here it is the generic power-iteration engine over any (src, dst)
  * DataFrame.
  *
  * Every iteration is deterministic and engine-exact: per-edge
  * contributions rank(u)/outdeg(u) are quantized to decimal(24,12)
  * before the per-node sum (order-free exact — a raw double sum would
  * vary with partition merge order; the
  * [[Corpus.crossEntropyScore]] convention), and the damped update is a
  * per-row double formula over those exact sums, re-quantized per
  * iteration. Dangling mass (nodes with no out-edges) is redistributed
  * uniformly, the standard stochastic-matrix completion. */
object Graph {

  /** The shared co-occurrence EDGE BUILD: canonical item pairs
    * (src < dst) sharing a basket, with `w` = number of distinct baskets
    * supporting the pair. Feeds the q118/q119/q121 graph family.
    *
    * The scale guarantee (not a caveat): baskets holding more than
    * `maxBasketItems` DISTINCT items are dropped WHOLE before any
    * pairing — the [[Mining.associationRules]] market-basket discipline.
    * Pairing fans out O(B²) per basket, so ONE degenerate hot basket (a
    * crawler session touching every product, a catalog-wide order) would
    * otherwise blow the edge build regardless of how well the graph
    * operators behave; with the cap enforced here, per-basket fanout is
    * ≤ cap² by construction. Dropping (not truncating) keeps the
    * semantics declarative — any SQL oracle mirrors it with a
    * HAVING-count prefilter.
    *
    * Scale shape: one (basket, item) distinct; one basket-keyed
    * exchange where the size filter (a sort-spillable window count — a
    * degenerate basket never builds an in-memory array before the cap
    * can drop it) and the per-basket packing share the same clustering;
    * then a JOIN-FREE double-explode pairing (no self-join, nothing for
    * a planner to mis-shuffle) into a map-side-combinable (src, dst)
    * count at pair grain. */
  def basketPairs(rows: DataFrame, basketCol: String, itemCol: String,
      maxBasketItems: Int = 64): DataFrame =
    packedBaskets(rows, basketCol, itemCol, maxBasketItems)
      .select(explode(col("__is")).as("src"), col("__is"))
      .select(col("src"), explode(col("__is")).as("dst"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))

  /** BOTH-direction co-occurrence edges (src ≠ dst), one output row per
    * ordered pair occurrence — the [[pageRank]] input shape. Emitting
    * the two directions inside the SAME explode pass matters: a
    * `pairs UNION mirrored(pairs)` would evaluate the whole pairing
    * subtree twice (Spark reuses nothing across union branches without
    * an explicit cache), and dedup belongs downstream where it can fuse
    * into pageRank's one-time src repartition (`distinctEdges = true`).
    * Same whole-basket cap discipline as [[basketPairs]]. */
  def basketEdges(rows: DataFrame, basketCol: String, itemCol: String,
      maxBasketItems: Int = 64): DataFrame =
    packedBaskets(rows, basketCol, itemCol, maxBasketItems)
      .select(explode(col("__is")).as("src"), col("__is"))
      .select(col("src"), explode(col("__is")).as("dst"))
      .filter(col("src") =!= col("dst"))

  /** The shared capped-basket prefix: (basket, sorted distinct-item
    * array) with oversized baskets dropped whole — the cap runs as a
    * sort-spillable window count BEFORE any array materializes, and the
    * per-basket packing reuses the window's basket clustering (no extra
    * exchange between cap and pack). */
  private def packedBaskets(rows: DataFrame, basketCol: String, itemCol: String,
      maxBasketItems: Int): DataFrame = {
    require(maxBasketItems >= 2, s"maxBasketItems must be >= 2, got $maxBasketItems")
    // ONE basket-keyed exchange for the whole prefix: hash(__b) satisfies
    // the (__b, __i) dedup's clustering (subset rule — same discipline as
    // [[pageRank]]'s dedup-on-the-repartition), the window's hash(__b),
    // and the packing groupBy, so dedup + cap + pack all ride the single
    // repartition. A plain `.distinct()` here cost its own (__b, __i)
    // exchange and then the window re-exchanged by __b anyway — two
    // full-data shuffles for one.
    val bi = rows
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull)
      .repartition(col("__b"))
      .dropDuplicates("__b", "__i")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__b"))
    bi.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") <= maxBasketItems)
      .groupBy(col("__b")).agg(sort_array(collect_list(col("__i"))).as("__is"))
  }

  /** PageRank by power iteration (Brin & Page 1998) over a directed edge
    * list; returns (node, out_deg, rank) with rank rounded to 6 dp.
    *
    * rank'(v) = (1−d)/N + d·(Σ_{u→v} q(rank(u)/outdeg(u)) + dang/N)
    * where q(…) quantizes to decimal(24,12) and dang is the summed rank
    * of dangling nodes. Multi-edges count multiply — pass
    * `distinctEdges = true` for simple-graph semantics (cheaper than a
    * caller-side `distinct()`: the dedup shares the repartition's
    * exchange).
    *
    * Scale shape: the edge list — hash-partitioned by src ONCE and
    * persisted in that layout — is the only big dataset; each iteration
    * is one join keyed src (broadcast of the node-sized rank frame while
    * it fits, cached-layout reuse with no edge exchange when it does
    * not) and one map-side-combinable groupBy keyed dst — the canonical
    * distributed PageRank step, cost O(|E|) per iteration with no global
    * sort and no edge-sized exchange. The dangling-mass scalar rides in
    * the same job as a broadcast one-row aggregate, so each iteration is
    * exactly one Spark job over node-sized shuffles. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      distinctEdges: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    // hash-partition the edge list by src ONCE and persist that layout:
    // every iteration's contribution join keys on src, so a non-broadcast
    // join plan reuses the cached partitioning instead of re-exchanging
    // the full edge list per iteration — the only edge-sized exchange in
    // the whole computation is this one-time repartition.
    // `distinctEdges` dedups for simple-graph semantics INSIDE that same
    // exchange: hash(src) satisfies the (src, dst) aggregation's required
    // clustering, so the dedup piggybacks on the repartition instead of
    // costing its own (src, dst) exchange like a caller-side distinct().
    val cast = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
    val e = (if (distinctEdges) cast.dropDuplicates("src", "dst") else cast)
      .persist()
    // (node, out_deg) in ONE map-side-combinable exchange: every endpoint
    // occurrence rides as a 1 (src — an out-edge) or a 0 (dst — presence
    // only), so the single sum aggregation IS both the node-universe
    // distinct and the out-degree count. The former shape (union →
    // distinct → left join groupBy(src)) paid three |E|-sized exchanges
    // for the same frame; partial aggregation shrinks this one to
    // node-sized before it ever crosses the wire (guide §2.3/§2.4).
    val nd = e.select(col("src").as("node"), lit(1L).as("__c"))
      .unionByName(e.select(col("dst").as("node"), lit(0L).as("__c")))
      .groupBy(col("node")).agg(sum(col("__c")).as("out_deg"))
      .na.fill(0L, Seq("out_deg"))
      .persist()
    try {
      // node count and the dangling-structure probe in ONE driver action
      // over the node-sized cache (was: nd.count + a separate limit job)
      val hdr = nd.agg(count(lit(1)),
        sum(when(col("out_deg") === 0, 1L).otherwise(0L))).first()
      val n = hdr.getLong(0)
      require(n > 0, "edge list is empty")
      // the initial uniform rank frame is a pure projection of the cached
      // nd — materializing it separately bought nothing; iteration 1
      // projects it straight off the cache
      var ranks = nd
        .select(col("node"), col("out_deg"),
          lit(1.0 / n).cast("decimal(24,12)").as("rank"))
      val base = (1.0 - damping) / n
      // one structural check up front: a graph with no dangling nodes
      // (e.g. any symmetric graph) skips the per-iteration mass scalar —
      // dangling-ness is a property of the edges, not of the ranks
      val hasDangling = hdr.getLong(1) > 0
      // every iteration frame is persisted (ranks has up to TWO consumers
      // — the contribution join and the dangling-mass aggregate — so an
      // unpersisted chain would re-evaluate exponentially), but NOTHING
      // is counted until the end: the per-iteration count() was a
      // blocking driver round-trip per iteration, and dropping it lets
      // the whole power iteration run as ONE submitted action whose
      // caches fill lazily on first use. Unpersists defer to the end for
      // the same reason — freeing iteration i before i+1 materialized
      // would collapse the chain into a recompute. All frames are
      // node-sized, so holding `iterations` of them is the cheap side of
      // the trade at any scale.
      val kept = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (_ <- 1 to iterations) {
        val contrib = e
          .join(ranks.select(col("node").as("src"), col("rank"), col("out_deg")),
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
        kept += ranks
        ranks = next
      }
      val out = ranks.select(col("node"), col("out_deg"),
        round(col("rank").cast("double"), 6).as("rank")).persist()
      out.count(): Unit
      (kept :+ ranks).foreach(_.unpersist(): Unit)
      out
    } finally { e.unpersist(): Unit; nd.unpersist(): Unit }
  }

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007), made fully deterministic: labels start as node ids;
    * each round every node adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label; all nodes update
    * from the previous round's labels simultaneously. A fixed round
    * count (not convergence) bounds the loop, so the output is a pure
    * function of the edge set — engine-exact and oracle-replayable.
    * Input is treated as undirected (symmetrized, self-loops dropped).
    * Returns (node, community).
    *
    * Scale shape: each round is one join of the symmetrized edge list
    * with the node-sized label frame (AQE broadcasts labels while they
    * fit), one map-side-combinable (node, label) count, and one
    * per-node window over ≤ distinct-neighbor-label rows — O(|E|) per
    * round, no global sort, same iteration discipline as [[pageRank]]
    * (persist + materialize + unpersist previous). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 100, s"rounds must be in [1, 100], got $rounds")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // hash-partitioned by nbr ONCE (the [[pageRank]] edge discipline):
    // every round's label join keys on nbr, so a non-broadcast plan
    // reuses the cached layout instead of re-exchanging the symmetrized
    // edge list per round
    val sym = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
      .repartition(col("nbr"))
      .persist()
    try {
      val nodes = sym.select(col("node")).distinct().persist()
      try {
        // same deferred-materialization discipline as [[pageRank]]: each
        // round's label frame persists (it feeds the next round's join)
        // but nothing counts until the caller's action — one submitted
        // job instead of a blocking driver round-trip per round
        val kept = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        var labels = nodes.select(col("node"), col("node").as("community")).persist()
        for (_ <- 1 to rounds) {
          val counted = sym
            .join(labels.select(col("node").as("nbr"), col("community")), Seq("nbr"))
            .groupBy(col("node"), col("community")).agg(count(lit(1)).as("n"))
          // winner per node = max count, ties to the SMALLEST label —
          // expressed as one map-side-combinable max(struct) instead of a
          // row_number window: the window needed a second exchange (hash
          // (node, community) does not satisfy the window's hash(node))
          // plus a per-node sort; the struct max is a DeclarativeAggregate
          // that partial-combines before the wire. Tie order: struct
          // comparison is field-by-field, and bitwise NOT inverts long
          // order exactly (x < y ⟺ ~x > ~y, no overflow at Long.MinValue
          // — unlike negation), so max(~community) IS min(community).
          val winner = counted
            .groupBy(col("node"))
            .agg(max(struct(col("n").as("n"),
              bitwise_not(col("community")).as("nc"))).as("__w"))
            .select(col("node"), bitwise_not(col("__w.nc")).as("community"))
          // isolated nodes (none here — every node has an edge) would
          // keep their own label via the left join + coalesce
          val next = nodes
            .join(winner, Seq("node"), "left")
            .select(col("node"),
              coalesce(col("community"), col("node")).as("community"))
            .persist()
          kept += labels
          labels = next
        }
        labels.count(): Unit
        kept.foreach(_.unpersist(): Unit)
        labels
      } finally nodes.unpersist(): Unit
    } finally sym.unpersist(): Unit
  }

  /** Per-node triangle counts by degree-ordered edge orientation (the
    * Schank & Wagner 2005 / Cohen 2009 MapReduce formulation): treat the
    * input as undirected (canonicalize, drop self-loops, dedup), orient
    * every edge from its lexicographically-smaller (degree, id) endpoint
    * to the larger, enumerate wedges from each source's oriented
    * out-neighbors, and close them against the oriented edge set. Every
    * triangle {a,b,c} is found exactly once.
    *
    * Returns (node, n_triangles) for nodes in at least one triangle —
    * exact integer counts, no float channel at all.
    *
    * Scale shape: orientation is THE fanout bound — oriented out-degree
    * is O(√|E|) even at power-law hubs (a celebrity node with degree 10⁶
    * contributes wedges only through its few HIGHER-degree neighbors,
    * not its 10⁶ fans), so the wedge join is Σ outdeg² ≤ |E|·√|E| rather
    * than Σ deg² ≈ |E|·max-deg. All three steps are equi-joins/groupBys
    * (no cartesian anywhere — PlanAudit); the closing join keys on the
    * (v, w) pair, map-side-combinable counts on both degree and triangle
    * aggregations. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct().persist()
    try {
      val deg = und.select(col("a").as("node"))
        .unionByName(und.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val ornt = und
        .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
        .select(
          when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
          when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"),
          when(col("da") <= col("db"), col("db")).otherwise(col("da")).as("ddeg"))
        .persist()
      try {
        val e1 = ornt.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
        val e2 = ornt.select(col("src"), col("dst").as("w"), col("ddeg").as("dw"))
        val wedges = e1.join(e2, Seq("src"))
          .filter(col("dv") < col("dw") ||
            (col("dv") === col("dw") && col("v") < col("w")))
        val tri = wedges
          .join(ornt.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
          .select(col("src").as("u"), col("v"), col("w"))
        val out = tri.select(col("u").as("node"))
          .unionByName(tri.select(col("v").as("node")))
          .unionByName(tri.select(col("w").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
          .persist()
        out.count(): Unit
        out
      } finally ornt.unpersist(): Unit
    } finally und.unpersist(): Unit
  }
}
