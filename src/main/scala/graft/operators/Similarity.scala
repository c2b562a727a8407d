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
  *    is tunable via `planes` (fewer planes → bigger buckets → higher recall)
  *    and `multiProbe` (per query, also probe the buckets one low-margin
  *    sign flip away — implemented in [[lshTopK]], measured in
  *    AnnRecallSpec, query-side-only cost).
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
    // deliberately LAZY (no corpus-side persist): the per-match
    // re-evaluation the PQ path pays for its m×ksub argmin trees is here
    // just a toDouble/norm per pair, and for a sub-second query the extra
    // persist + materialize actions cost MORE than they save — measured
    // in the round-15 medians (q27/q97 ~2x worse eager vs ~1.3x host
    // drift). ivfPqTopK keeps its persisted encode: there the stream-side
    // projection is two orders of magnitude heavier.
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

  /** `bands` independent LSH hash tables of `rowsPerBand` sign bits each —
    * the SRP analogue of banded MinHash. Element b of the returned array is
    * the bucket id in table b, built from the GLOBAL plane indices
    * [b·rowsPerBand, (b+1)·rowsPerBand), so an oracle regenerating planes by
    * global index agrees bit-for-bit. A pair is a near-dup candidate iff it
    * collides in at least one band: recall = 1-(1-p^rowsPerBand)^bands with
    * p = 1 - angle/pi — tune bands up / rowsPerBand down for recall, the
    * reverse for candidate-set precision. */
  def lshBandBuckets(vec: Column, bands: Int, rowsPerBand: Int, dims: Int): Column = {
    val signs = planeSigns(bands * rowsPerBand, dims)
    array((0 until bands).map { b =>
      (0 until rowsPerBand).map { r =>
        val plane = array(signs(b * rowsPerBand + r).map(lit): _*)
        when(dot(vec, plane) > 0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
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
    * are missed (standard IVF behavior).
    *
    * Scale shape: centroids are COLLECTED to the driver (O(nlist·dims)
    * doubles — the same driver-constant pattern as [[planeSigns]]) and
    * inlined as literal arrays, so list assignment is a pure per-row
    * projection over the corpus: no crossJoin fan-out, no window, and no
    * exchange between the corpus scan and the list equi-join. The probe
    * side (|queries|·nprobe rows) is broadcast, so the corpus's only
    * shuffle is the final per-query top-k window. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = collectCentroids(corpus, idCol, vecCol, nlist)
    // deliberately LAZY (the bruteForceTopK reasoning): the nlist-centroid
    // argmin re-evaluated per match is light enough that the extra
    // persist + materialize actions of an eager corpus cache cost more
    // than they save on this sub-second query shape
    val assigned = prepCorpus(corpus, idCol, vecCol)
      .withColumn("list_id", element_at(nearestListsCol(cents, "cv", "cn", 1), 1).getField("cid"))
    val probes = prepQueries(queries, idCol, vecCol)
      .withColumn("__l", explode(nearestListsCol(cents, "qv", "qn", nprobe)))
      .withColumn("list_id", col("__l").getField("cid")).drop("__l")
    scoreAndRank(broadcast(probes).join(assigned, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id")), k)
  }

  /** Centroid selection shared by [[ivfTopK]] and the persisted index:
    * training-free and deterministic — the `nlist` lowest-id corpus
    * vectors. Centroid ids keep the corpus id's own type (int, long,
    * string, …): they ride along as literals and an equi-join key, never
    * arithmetic. */
  private def collectCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Array[(Any, Array[Double], Double)] =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol), toDouble(col(vecCol)))
      .collect().map { r =>
        val cvec = r.getSeq[Double](1).toArray
        // norm accumulated in index order — bit-identical to
        // norm(col) = sqrt(graft_dot(v, v)), which also sums in order
        var s = 0.0; var i = 0
        while (i < cvec.length) { s += cvec(i) * cvec(i); i += 1 }
        (r.get(0), cvec, math.sqrt(s))
      }

  /** Per-row ranked centroid lists: sort (-cosine, cent_id) structs
    * ASCENDING — cosine desc then cent_id asc, the exact tie-break of the
    * oracle's ORDER BY cosine DESC, cent_id, without needing a negatable
    * id type. */
  private def nearestListsCol(cents: Array[(Any, Array[Double], Double)],
      vCol: String, nCol: String, n: Int): Column = {
    val entries = array(cents.map { case (cid, cvec, cnorm) =>
      struct(
        (-(dot(col(vCol), array(cvec.map(lit): _*)) / (col(nCol) * lit(cnorm)))).as("nc"),
        lit(cid).as("cid"))
    }: _*)
    slice(sort_array(entries, asc = true), 1, n)
  }

  // ------------------------------------------------- persisted IVF index

  /** Build a PERSISTED IVF index at `indexPath`: two GraftTables —
    * `centroids` (cent_id, cvec, cnorm) and `postings` (list_id,
    * neighbor_id, cv, cn), the assigned corpus CLUSTERED by list_id with
    * list_id file stats. Querying ([[ivfIndexTopK]]) then reads only the
    * files holding probed lists, and the expensive assignment pass is
    * paid once per corpus, not once per query — the index-reuse
    * economics every ANN deployment runs on. Returns the postings
    * version. Results are bit-identical to [[ivfTopK]] with the same
    * (nlist, nprobe, k) by shared construction. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      indexPath: String, nlist: Int = 16, numFiles: Int = 8): Long = {
    import graft.core.GraftTable
    val cents = collectCentroids(corpus, idCol, vecCol, nlist)
    val centDf = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cent_id"), toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
    GraftTable.overwrite(centDf, s"$indexPath/centroids")
    val assigned = prepCorpus(corpus, idCol, vecCol)
      .withColumn("list_id", element_at(nearestListsCol(cents, "cv", "cn", 1), 1).getField("cid"))
      .select(col("list_id"), col("neighbor_id"), col("cv"), col("cn"))
    GraftTable.writeClustered(assigned, s"$indexPath/postings", col("list_id"),
      numFiles, statsCols = Seq("list_id"))
    GraftTable.currentVersion(s"$indexPath/postings").get
  }

  private def readCentroids(spark: SparkSession, indexPath: String): Array[(Any, Array[Double], Double)] =
    graft.core.GraftTable.read(spark, s"$indexPath/centroids")
      .orderBy(col("cent_id")).collect()
      .map(r => (r.get(0), r.getSeq[Double](1).toArray, r.getDouble(2)))

  /** Incremental index maintenance: assign `delta`'s vectors against the
    * PERSISTED centroids (no retraining — standard IVF practice; rebuild
    * when drift warrants) and copy-on-write upsert them into the
    * postings by neighbor_id — a re-ingested vector replaces its old
    * posting even if its list changed. Cost: one delta-sized assignment
    * projection plus the upsert's touched files. */
  def refreshIvfIndex(spark: SparkSession, indexPath: String, delta: DataFrame,
      idCol: String, vecCol: String): Long = {
    val cents = readCentroids(spark, indexPath)
    val assigned = prepCorpus(delta, idCol, vecCol)
      .withColumn("list_id", element_at(nearestListsCol(cents, "cv", "cn", 1), 1).getField("cid"))
      .select(col("list_id"), col("neighbor_id"), col("cv"), col("cn"))
    graft.core.GraftTable.upsertByKey(spark, s"$indexPath/postings", assigned,
      Seq("neighbor_id"), statsCols = Seq("list_id"))
  }

  /** Query the persisted index: probes rank against the centroid table
    * (driver-sized collect, the [[ivfTopK]] discipline), then the
    * postings scan SKIPS every file whose list_id stats cover none of
    * the probed lists ([[graft.core.GraftTable.readPrunedIn]]) — on the
    * clustered layout that is the inverted-list read pattern realized as
    * file skipping. The probed-list set is bounded by nlist (centroid-
    * table-sized), never by |queries|. */
  def ivfIndexTopK(spark: SparkSession, indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val cents = readCentroids(spark, indexPath)
    val probes = prepQueries(queries, idCol, vecCol)
      .withColumn("__l", explode(nearestListsCol(cents, "qv", "qn", nprobe)))
      .withColumn("list_id", col("__l").getField("cid")).drop("__l")
    val lists = probes.select("list_id").distinct().collect().map(_.get(0)).toSeq
    val scan = graft.core.GraftTable.readPrunedIn(spark, s"$indexPath/postings",
      "list_id", lists)
    scoreAndRank(broadcast(probes).join(scan.df, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id")), k)
  }

  /** IVFPQ ANN top-k — the memory-scale step past [[ivfTopK]] (Jégou et al.
    * 2011, product quantization): corpus vectors are coarse-assigned to
    * `nlist` inverted lists AND compressed to `m` codebook indices (one per
    * dims/m-wide subspace); queries probe their `nprobe` closest lists and
    * score candidates by ADC — the sum of per-subspace distances looked up
    * from a query-local table — so the scored corpus rows carry m small ints
    * instead of dims floats (dims·4/m bytes compression, the reason IVFPQ
    * indexes hold 10⁹+ vectors in RAM).
    *
    * Every distance is squared L2 over micro-unit-quantized integers
    * (|v|² − 2·v·w + |w|², each term an integer-valued double, exact below
    * 2⁵³), so assignment, encoding, and ADC scores are bit-reproducible in
    * any engine — no rounding contract needed at all. Codebooks and coarse
    * centroids are training-free (the max(nlist, ksub) lowest-id corpus
    * vectors; a k-means-trained table is a drop-in swap, same as
    * [[ivfTopK]]) and inlined as literals, so list assignment and PQ
    * encoding are pure per-row projections — no exchange between the corpus
    * scan and the final list equi-join against the broadcast probe side.
    * Ranking: ADC ascending, neighbor-id tie-break. Returns
    * (query_id, neighbor_id, adc, rnk); adc is exact-integer BIGINT.
    *
    * `rerank` = R > 0 adds the standard refine step (the recall answer to
    * ADC's lossy codes, measured in AnnRecallSpec): the top-R candidates
    * per query by ADC fetch their ORIGINAL vectors and re-score exact
    * cosine; output then matches the other ANN paths — (query_id,
    * neighbor_id, cosine, rnk). Scale shape: the shortlist is |Q|·R rows —
    * broadcast against the corpus, so the vector fetch scans the corpus
    * once with no shuffle; ADC still did the heavy winnowing over
    * compressed codes. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, rerank: Int = 0): DataFrame = {
    require(nprobe <= nlist, "nprobe cannot exceed nlist")
    val nSeeds = math.max(nlist, ksub)
    val seeds: Array[Array[Double]] = corpus.orderBy(col(idCol)).limit(nSeeds)
      .select(Cluster.quantize(col(vecCol))).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == nSeeds, s"need at least $nSeeds corpus vectors")
    val dims = seeds(0).length
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val sub = dims / m
    val cents = seeds.take(nlist)
    // codeword (s, c) = subspace s of seed c — one codebook per subspace
    val cw = Array.tabulate(m, ksub)((s, c) => seeds(c).slice(s * sub, (s + 1) * sub))

    def litArr(a: Array[Double]): Column = array(a.map(lit): _*)
    // integer-exact squared L2 to a driver-side literal; |w|² folds to a
    // constant and |v|² is shared across all candidates of one argmin
    def l2(v: Column, vv: Column, w: Array[Double]): Column =
      vv - lit(2.0) * dot(v, litArr(w)) + lit(w.foldLeft(0.0)((a, x) => a + x * x))
    // argmin by (distance, index): struct comparison is lexicographic, so
    // equal distances break to the lowest codeword/list id — the oracle's
    // ORDER BY d, j
    def ranked(v: Column, vv: Column, table: Array[Array[Double]]): Column =
      sort_array(array(table.indices.map(j =>
        struct(l2(v, vv, table(j)).as("d"), lit(j).as("j"))): _*))
    def argmin(v: Column, vv: Column, table: Array[Array[Double]]): Column =
      element_at(ranked(v, vv, table), 1).getField("j")

    // PERSISTED: this is the PQ-compressed corpus — the narrow
    // (id, list, m codes) relation an IVFPQ deployment holds in memory.
    // The performance reason is sharper than reuse: the broadcast-hash
    // join below evaluates its STREAM-side projection inside the match
    // loop of the generated code — per PAIR, not per corpus row — so an
    // unpersisted encode re-runs the nlist + m×ksub argmin trees once
    // per matching probe (~nprobe·|Q|/nlist times per vector; measured
    // 25-40 s of task CPU on a 2,000-row corpus at q60's shape vs ~1 s
    // for the encode itself). Materialized codes make the join side a
    // plain attribute read.
    val encoded = prepCorpus(corpus, idCol, vecCol)
      .select(col("neighbor_id"), Cluster.quantize(col("cv")).as("__vq"))
      .withColumn("__vv", dot(col("__vq"), col("__vq")))
      .select(col("neighbor_id"),
        argmin(col("__vq"), col("__vv"), cents).as("list_id"),
        array((0 until m).map { s =>
          val sv = slice(col("__vq"), s * sub + 1, sub)
          argmin(sv, dot(sv, sv), cw(s))
        }: _*).as("__codes"))
      .persist()
    val dtabs = (0 until m).map { s =>
      val sv = slice(col("__qq"), s * sub + 1, sub)
      array(cw(s).indices.map(c => l2(sv, dot(sv, sv), cw(s)(c))): _*).as(s"__dt$s")
    }
    val probes = queries
      .select(col(idCol).as("query_id"), Cluster.quantize(col(vecCol)).as("__qq"))
      .withColumn("__qv", dot(col("__qq"), col("__qq")))
      .select(col("query_id") +:
        explode(slice(ranked(col("__qq"), col("__qv"), cents), 1, nprobe)).as("__l") +:
        dtabs: _*)
      .withColumn("list_id", col("__l").getField("j")).drop("__l")
    val adc = (0 until m)
      .map(s => element_at(col(s"__dt$s"), col("__codes").getItem(s) + 1))
      .reduce(_ + _)
    // each corpus vector lives in exactly one list, so a (query, neighbor)
    // pair appears at most once — no post-join dedup needed
    val pairs = broadcast(probes).join(encoded, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.cast("long").as("adc"))
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
    val byAdc = pairs.withColumn("rnk", row_number().over(w))
    // materialize eagerly so the barrier frame can be freed here (the
    // Dedup/kmeansAssign result-lifecycle convention)
    val out =
      if (rerank <= 0) byAdc.filter(col("rnk") <= k).persist()
      else {
        require(rerank >= k, s"rerank=$rerank must be >= k=$k")
        val shortlist = byAdc.filter(col("rnk") <= rerank)
          .select(col("query_id"), col("neighbor_id"))
        // |Q|·R rows + query vectors: broadcast, so the original-vector fetch
        // streams the corpus through a BroadcastHashJoin — no corpus shuffle
        val withQ = broadcast(shortlist.join(prepQueries(queries, idCol, vecCol), Seq("query_id")))
        scoreAndRank(withQ.join(prepCorpus(corpus, idCol, vecCol), Seq("neighbor_id")), k)
          .persist()
      }
    out.count(): Unit
    encoded.unpersist()
    out
  }

  /** k-NN label prediction over the embedding column — the
    * nearest-neighbor classifier every labeled-corpus pipeline wants
    * (quality-tier propagation, weak labeling): majority vote of the
    * exact top-k cosine neighbors, ties broken by (votes desc, smallest
    * label). Returns (query_id, pred_label, votes).
    *
    * Scale shape: the |Q|·k neighbor list broadcasts against the corpus's
    * label projection, so the label fetch streams the corpus with no
    * shuffle; the vote count groups |Q|·k rows. Swap the candidate
    * generator for [[ivfTopK]]/[[lshTopK]] output at corpus scale — any
    * (query_id, neighbor_id) frame votes the same way. */
  def knnPredict(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nn = bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val labels = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("__lbl"))
    val votes = broadcast(nn).join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("query_id").orderBy(col("votes").desc, col("__lbl"))
    votes.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("query_id"), col("__lbl").as("pred_label"), col("votes"))
  }

  /** Johnson–Lindenstrauss random projection: embed `dims`-dimensional
    * vectors into `outDims` dimensions as proj_j = Σ_i v_i·sign(j,i) with
    * the deterministic MD5 Rademacher signs of [[planeSigns]] — the
    * database-style JL transform (Achlioptas 2003: ±1 entries preserve
    * pairwise distances within 1±ε for outDims ≳ 8·ln(n)/ε²). Components
    * are micro-unit quantized first, so every projection coordinate is an
    * integer-exact BIGINT any engine reproduces. The conventional 1/√outDims
    * scale factor is omitted — it cancels in cosine and rank comparisons,
    * and keeping the outputs integer keeps them hash-gateable.
    *
    * Scale shape: a pure per-row projection over a literal sign matrix —
    * outDims codegen'd dot kernels per row, no exchange of any kind. The
    * natural prefix of the ANN paths: project once, then bucket/score in
    * the cheap space. Returns (idCol, proj array<bigint>). */
  def randomProject(vecs: DataFrame, idCol: String, vecCol: String,
      outDims: Int, dims: Int): DataFrame = {
    require(outDims > 0 && dims > 0, "outDims and dims must be positive")
    val signs = planeSigns(outDims, dims)
    val q = Cluster.quantize(col(vecCol))
    vecs.select(col(idCol),
      array((0 until outDims).map(j =>
        dot(q, array(signs(j).map(lit): _*)).cast("long")): _*).as("proj"))
  }

  /** ANN top-k via LSH buckets: hash corpus and queries once, equi-join on
    * bucket, brute-force within the bucket. Approximate — neighbors hashed to
    * other buckets are missed (recall/planes tradeoff documented above).
    *
    * `multiProbe` = n additionally probes, per query, the n buckets
    * obtained by flipping its n least-confident sign bits (smallest |dot|
    * margin, plane-index tie-break — multi-probe LSH, Lv et al. 2007):
    * the query side fans out ×(n+1) while the corpus is never re-hashed
    * or replicated, which is the whole point at corpus scale. Probed
    * buckets are pairwise distinct and each corpus row lives in exactly
    * one bucket, so a (query, neighbor) pair still appears at most once —
    * no dedup join needed. AnnRecallSpec measures the recall lift against
    * [[bruteForceTopK]]. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4, dims: Int = 64,
      multiProbe: Int = 0): DataFrame = {
    require(multiProbe >= 0 && multiProbe <= planes,
      s"multiProbe must be in [0, planes=$planes], got $multiProbe")
    val qb = prepQueries(queries, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("qv"), planes, dims))
    val q =
      if (multiProbe == 0) qb
      else {
        val signs = planeSigns(planes, dims)
        val bitLit = array((0 until planes).map(j => lit(1L << j)): _*)
        // (|margin|, plane) sorted ascending = least-confident planes first
        val margins = array((0 until planes).map { j =>
          struct(abs(dot(col("qv"), array(signs(j).map(lit): _*))).as("m"),
            lit(j).as("j"))
        }: _*)
        val flips = transform(slice(sort_array(margins), 1, multiProbe),
          f => col("bucket").bitwiseXOR(element_at(bitLit, f.getField("j") + 1)))
        qb.withColumn("bucket", explode(concat(array(col("bucket")), flips)))
      }
    // deliberately LAZY corpus side (the bruteForceTopK reasoning): the
    // per-match lshBucket re-evaluation is a few codegen'd dots, cheaper
    // than an eager cache's extra actions on this query shape
    val c = prepCorpus(corpus, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("cv"), planes, dims))
    scoreAndRank(q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id")), k)
  }
}
