package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Similarity.{dot, toDouble}

/** Embedding-space clustering and the semantic dedup built on it
  * (SemDeDup, Abbas et al. 2023: k-means the corpus, then pairwise-compare
  * only WITHIN clusters — the cluster structure bounds the quadratic term,
  * which is the whole scale argument; the reference engine has no
  * clustering operator, added per the LLM-data-pipeline mandate).
  *
  * Spherical k-means (assignment by cosine, the metric the dedup uses)
  * with every arithmetic step chosen to be bit-reproducible in any engine:
  *  - vectors are quantized to integer micro-units (round(x·10⁶)) — cosine
  *    is invariant under positive scaling, and integer-valued sums are
  *    exact and ORDER-FREE, so centroid means never ride on float
  *    summation order;
  *  - initial centroids are the k lowest-id vectors (deterministic);
  *  - assignment ranks by 6-dp-rounded cosine with lowest-cluster-id
  *    tie-break (the [[Similarity]] ranking contract);
  *  - empty clusters keep their previous centroid.
  *
  * Scale shape: each round is one shuffle-free per-row argmax over k
  * literal centroid arrays (the same centroids-as-literals pattern as
  * [[Similarity.ivfTopK]] — no crossJoin, no window) plus one
  * map-side-combinable (cluster, dim) aggregation whose exchange carries
  * at most partitions × k × dims rows; the quantized frame is cached for
  * the loop the way any iterative fitter caches its feature matrix. The
  * k×dims centroid sync through the driver per round is the allreduce
  * every distributed k-means performs. Integer-valued double sums stay
  * exact below 2⁵³ ≈ 9·10¹⁵ micro-units per (cluster, dim) — beyond that
  * (≳10⁹ rows per cluster), swap the sum to decimal(38,0).
  */
object Cluster {

  /** Quantize a float vector to integer micro-units held as doubles. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000000, 0))

  private def centLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** 6-dp cosine against a driver-side centroid; the centroid norm is
    * folded to a literal (same left-to-right sum as the SQL mirror). */
  private def cosToCent(vq: Column, vn: Column, c: Array[Double]): Column = {
    val cn = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
    round(dot(vq, centLit(c)) / (vn * lit(cn)), 6)
  }

  /** argmax_j cosine as one expression: array_min over struct(-cos, j)
    * picks the highest rounded cosine, then the lowest cluster id. */
  private def bestCluster(vq: Column, vn: Column, cents: Seq[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, j) =>
      struct((-cosToCent(vq, vn, c)).as("neg"), lit(j).as("cl"))
    }: _*)).getField("cl")

  /** Spherical k-means assignment after `iters` rounds (updates happen
    * between rounds, so `iters = 1` scores the initial centroids).
    * Returns (idCol, cluster), materialized and CACHED (the [[Dedup]]
    * lifecycle convention) — `unpersist()` the result when done. */
  def kmeansAssign(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3): DataFrame = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val prep = Ops.spread(vecs)
      .select(col(idCol), quantize(col(vecCol)).as("__vq"))
      .withColumn("__vn", sqrt(dot(col("__vq"), col("__vq"))))
      .persist()
    try {
      var cents: Seq[Array[Double]] = prep.orderBy(col(idCol)).limit(k)
        .select(col("__vq")).collect()
        .map(_.getSeq[Double](0).toArray).toSeq
      require(cents.size == k, s"need at least $k vectors to seed $k clusters")
      for (_ <- 1 until iters) {
        val assigned = prep.withColumn("__cl", bestCluster(col("__vq"), col("__vn"), cents))
        // partial-aggregated on the map side: the exchange carries at most
        // partitions × k × dims rows, never corpus × dims
        val sums = assigned
          .select(col("__cl"), posexplode(col("__vq")).as(Seq("__d", "__v")))
          .groupBy("__cl", "__d").agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
          .collect()
        // rows carry (cl, d, s, n); d is 0-based from posexplode
        val next = sums.groupBy(_.getInt(0)).map { case (cl, rows) =>
          val arr = new Array[Double](cents(cl).length)
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
          cl -> arr
        }
        cents = cents.indices.map(j => next.getOrElse(j, cents(j)))
      }
      val out = prep
        .select(col(idCol), bestCluster(col("__vq"), col("__vn"), cents).as("cluster"))
        .persist()
      out.count(): Unit
      out
    } finally prep.unpersist(): Unit
  }

  /** Upper-triangle Gram matrix of the embedding corpus — the input to
    * driver-side PCA / whitening (the k × dims eigendecomposition is a
    * constant-size driver step, exactly like the centroid sync): G(i,j) =
    * Σ_rows q_i·q_j over micro-unit-quantized vectors, so every product
    * and sum is integer-exact and order-free (engine-exact; swap the sum
    * to decimal(38,0) beyond ~2⁵³). Returns (i, j, g) for j ≥ i, 0-based.
    *
    * Scale shape: the double-generate expands dims²/2 terms per row INSIDE
    * the scan stage and partial-aggregates them map-side — the exchange
    * carries at most partitions × dims²/2 rows, never corpus-sized data;
    * O(n·d²) multiply work is inherent to a Gram computation. */
  def gramMatrix(vecs: DataFrame, vecCol: String): DataFrame = {
    val prep = Ops.spread(vecs).select(quantize(col(vecCol)).as("__q")).persist()
    try {
      val out = prep
        .select(col("__q"), posexplode(col("__q")).as(Seq("i", "vi")))
        .select(col("i"), col("vi"), posexplode(col("__q")).as(Seq("j", "vj")))
        .filter(col("j") >= col("i"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("vi") * col("vj")).as("g"))
        .persist()
      out.count(): Unit
      out
    } finally prep.unpersist(): Unit
  }

  /** SemDeDup: k-means the embeddings, then flag semantic near-duplicates
    * WITHIN each cluster — a vector is dropped when a lower-id vector in
    * its cluster has cosine ≥ `tau`; the representative is the lowest such
    * id. Returns dropped rows only: (idCol, rep_id, cluster, cosine) with
    * the cosine to the representative, 6-dp rounded.
    *
    * Scale shape: the pair join is EQUI on the cluster id — pair work is
    * Σ|cluster|², bounded by choosing k ∝ corpus size (SemDeDup's core
    * trick), never global n². Vectors enter that shuffle once each. The
    * drop list is returned materialized and CACHED ([[Dedup]] lifecycle
    * convention) — `unpersist()` when done. */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3, tau: Double = 0.5): DataFrame = {
    val assign = kmeansAssign(vecs, idCol, vecCol, k, iters)
    // both self-join sides read this frame — persist once, free on return
    val prep = Ops.spread(vecs)
      .select(col(idCol).as("__id"), toDouble(col(vecCol)).as("__e"))
      .withColumn("__n", sqrt(dot(col("__e"), col("__e"))))
      .join(assign.withColumnRenamed(idCol, "__id"), Seq("__id"))
      .persist()
    try {
      // SALT the within-cluster pair join (guide §2.5): the join key has
      // only k distinct values, so an unsalted self-join enumerates each
      // cluster's pairs in ONE task — at 32 cores with k=8, 24 cores sit
      // idle (measured: q54 ran 2× faster at 8 cores than 32 for exactly
      // this). The a-side rows take one deterministic slice each
      // (hash(id) mod s), the b-side replicates s ways, and every (a,b)
      // pair meets in exactly one (cluster, slice) — identical output.
      // s is parallelism-derived and bounded (replication factor ≤ 16):
      // per-cluster pair enumeration spreads s-ways at any data size.
      val s = math.max(1, math.min(16,
        vecs.sparkSession.sparkContext.defaultParallelism / k))
      val a = prep.select(col("__id").as("id_a"), col("__e").as("ea"),
        col("__n").as("na"), col("cluster"),
        pmod(hash(col("__id")), lit(s)).as("__slice"))
      val b = prep.select(col("__id").as("id_b"), col("__e").as("eb"),
        col("__n").as("nb"), col("cluster"))
        .withColumn("__slice", explode(array((0 until s).map(lit): _*)))
      val pairs = a.join(b, Seq("cluster", "__slice"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
        .filter(col("cosine") >= tau)
      val out = pairs.groupBy(col("id_b"))
        .agg(min(struct(col("id_a"), col("cluster"), col("cosine"))).as("__m"))
        .select(col("id_b").as(idCol), col("__m.id_a").as("rep_id"),
          col("__m.cluster").as("cluster"), col("__m.cosine").as("cosine"))
        .persist()
      out.count(): Unit
      out
    } finally { prep.unpersist(); assign.unpersist(): Unit }
  }
}
