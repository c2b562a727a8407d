package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three paths, per the engine's ANN mandate:
  *  - `bruteForceTopK`: exact cosine top-k via a key-less join. Correctness
  *    baseline; O(|Q|·|C|) — fine when |Q| is small or as the within-bucket
  *    kernel of the other two.
  *  - `lshTopK` (scale path): sign-random-projection LSH — each vector maps
  *    to a small bucket id from the signs of dot products against
  *    deterministic Rademacher hyperplanes; the top-k search then joins on
  *    bucket id, turning the cross product into an equi-join shuffle. Recall
  *    is tunable via `planes` (fewer planes → bigger buckets → higher recall);
  *    multi-probe (flipping one sign bit) lifts recall without re-hashing.
  *  - `ivfTopK` (scale path, data-adaptive): inverted-file lists from a
  *    coarse centroid table; queries probe their nprobe closest lists.
  *
  * Hyperplanes are derived from MD5 (Rademacher ±1 per (plane, dim)) so both
  * engines — and any SQL oracle — regenerate bit-identical buckets. The dot
  * kernel is the codegen'd [[graft.expressions.DotProduct]]; everything else
  * is built-in Column ops, so all three paths stay whole-stage-compiled.
  */
object Similarity {

  /** Cast a float embedding to double for stable arithmetic. */
  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Codegen'd dot product (graft.expressions.DotProduct) — the hot kernel.
    * Registration is idempotent per session. */
  def dot(a: Column, b: Column): Column = {
    GraftFunctions.register(SparkSession.active)
    call_function("graft_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Query-side prep: (query_id, qv, qn) with the norm computed once per
    * vector — O(n) instead of O(n²) norm work across all ANN paths. */
  private def prepQueries(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))

  /** Corpus-side prep: (neighbor_id, cv, cn), fanned out to parallelism. */
  private def prepCorpus(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    Ops.spread(df).select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))

  /** Shared scoring tail for every ANN path: 6-dp-rounded cosine, ranked per
    * query with neighbor-id tie-break — the cross-engine oracle contract
    * lives HERE and nowhere else. */
  private def scoreAndRank(pairs: DataFrame, k: Int): DataFrame = {
    val scored = pairs.select(col("query_id"), col("neighbor_id"),
      round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Exact cosine top-k for each query vector against the corpus (self-match
    * excluded). Ties broken by candidate id after rounding to 6 dp so results
    * are deterministic across engines. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    scoreAndRank(prepQueries(queries, idCol, vecCol)
      .join(prepCorpus(corpus, idCol, vecCol), col("query_id") =!= col("neighbor_id")), k)

  /** Deterministic Rademacher hyperplanes: sign(plane j, dim i) = +1 if
    * hash32(j:i) is odd else -1, hash32 = first 8 md5 hex chars. */
  def planeSigns(planes: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (j, i) =>
      val h = md.digest(s"$j:$i".getBytes("UTF-8"))
      md.reset()
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      if ((v & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** Bucket id from sign bits: sum over planes j of (dot(v, plane_j) > 0) << j. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val signs = planeSigns(planes, dims)
    (0 until planes).map { j =>
      val plane = array(signs(j).map(lit): _*)
      when(dot(vec, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN top-k: corpus vectors are assigned to their
    * nearest of `nlist` coarse centroids (the inverted lists); each query
    * probes its `nprobe` closest lists and brute-forces only those
    * candidates. The shuffle is an equi-join on `list_id` — same scale shape
    * as LSH, but data-adaptive: lists follow the corpus distribution.
    *
    * Centroid selection is training-free and deterministic — the `nlist`
    * lowest-id corpus vectors — so any SQL oracle reproduces it exactly.
    * A real deployment k-means-trains the centroid table; it is a plain
    * (id, vector) relation, so swapping it in changes nothing else.
    * Recall tunes with nprobe/nlist; neighbors assigned to unprobed lists
    * are missed (standard IVF behavior). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cent_id"), toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
    def rankLists(df: DataFrame, id: String, v: String, n: String): DataFrame = {
      val w = Window.partitionBy(id).orderBy(
        (dot(col(v), col("cvec")) / (col(n) * col("cnorm"))).desc, col("cent_id"))
      df.crossJoin(broadcast(cents)).withColumn("__lr", row_number().over(w))
    }
    val assigned = rankLists(prepCorpus(corpus, idCol, vecCol), "neighbor_id", "cv", "cn")
      .filter(col("__lr") === 1)
      .select(col("cent_id").as("list_id"), col("neighbor_id"), col("cv"), col("cn"))
    val probes = rankLists(prepQueries(queries, idCol, vecCol), "query_id", "qv", "qn")
      .filter(col("__lr") <= nprobe)
      .select(col("cent_id").as("list_id"), col("query_id"), col("qv"), col("qn"))
    scoreAndRank(probes.join(assigned, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id")), k)
  }

  /** ANN top-k via LSH buckets: hash corpus and queries once, equi-join on
    * bucket, brute-force within the bucket. Approximate — neighbors hashed to
    * other buckets are missed (recall/planes tradeoff documented above). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4, dims: Int = 64): DataFrame = {
    val q = prepQueries(queries, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("qv"), planes, dims))
    val c = prepCorpus(corpus, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("cv"), planes, dims))
    scoreAndRank(q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id")), k)
  }
}
