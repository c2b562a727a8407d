package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SqlFunctions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Not in the reference (a pure warehouse) —
  * mandated by BASELINE.json's north star.
  *
  * Scale design:
  *  - exact dedup is one hash-groupBy shuffle on the fingerprint — the
  *    canonical map-side-combinable aggregation;
  *  - MinHash/LSH avoids the O(n²) pair space entirely: candidates come from
  *    an equi-join on (band, band_hash) buckets, so the shuffle is keyed by
  *    bucket and only colliding docs ever meet. Skewed buckets (boilerplate
  *    shingles) are the known hazard — cap bucket width before pairing;
  *  - SimHash is a pure per-row map (no shuffle) producing a 32-bit signature;
  *    near-dup candidates join on signature bands;
  *  - n-gram Jaccard verification joins candidates back to shingle sets.
  *
  * All hashes are MD5-derived (hash32 / lexicographic-min hex) so every
  * operator is reproducible bit-for-bit in any SQL oracle engine.
  *
  * Cache lifecycle: the pair generators persist intermediates (shingle
  * sets, band/bucket arrays, candidate pairs) that multiple plan branches
  * consume, MATERIALIZE their result eagerly, then unpersist every
  * intermediate before returning — a long-lived session looping over
  * corpora accumulates nothing. The returned frame itself is cached (it is
  * near-dup-pair-sized — tiny by construction) so downstream consumers
  * never recompute the pipeline; call `result.unpersist()` when done with
  * it. [[connectedComponents]]' distributed path likewise returns its final
  * cached label frame and frees everything else.
  */
object Dedup {

  /** Shared shingle prologue for every pair generator: fan the corpus out
    * ([[Ops.spread]]), project tokens, filter on TOKEN COUNT before
    * shingling (filtering on `size(sh)` would let
    * PushPredicateThroughProject inline the whole shingle expression —
    * with `tokens(text)` re-run per `element_at` — into the predicate:
    * measured 8.6 s vs 0.3 s on 5k docs), then build distinct n-gram
    * arrays and PERSIST them — the persisted array frame is also the
    * generator barrier (a Generate over an inline interpreted-HOF
    * projection re-evaluates it per OUTPUT row: measured 17 s vs 2.6 s
    * cold at sf0.1). Follows the batch cache-lifecycle convention above. */
  private[operators] def shingleFrame(df: DataFrame, idCol: String,
      textCol: String, n: Int, outId: String = "id"): DataFrame =
    Ops.spread(df)
      .select(col(idCol).as(outId), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(outId), shinglesOfTokens(col("__t"), n).as("sh"))
      .persist()

  /** Exact dedup by content fingerprint: one row per distinct text, keeping
    * the lowest id; `dup_count` reports group size. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature as an array of k hex-string minima over shingles:
    * sig[h] = min over shingles s of md5(h || ':' || s). Lexicographic min of
    * the hex encoding is a uniform permutation-min — and identical in SQL.
    * Backed by the single-pass [[graft.expressions.MinHashSignature]] kernel
    * (one loop per row vs k interpreted higher-order passes). */
  def minhashSignature(shingles: Column, k: Int): Column = {
    graft.expressions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_minhash", shingles, lit(k))
  }

  /** Jaccard for a set of candidate (id_a, id_b) pairs, computed WITHOUT
    * carrying shingle arrays through any shuffle: intersection sizes come
    * from a grouped count over the inverted index (shingles are distinct per
    * doc, so #co-occurrences = |A ∩ B|), union from |A|+|B|−|A∩B|. The only
    * shuffled payloads are (id, shingle) pairs and small count rows. */
  /** (id_a, id_b, inter) + per-doc set sizes -> (id_a, id_b, jaccard). */
  private def scorePairs(inter: DataFrame, sizes: DataFrame): DataFrame =
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))

  private def jaccardOfPairs(candidates: DataFrame, sh: DataFrame,
      broadcastCandidates: Boolean): DataFrame = {
    val sizes = sh.select(col("id"), size(col("sh")).as("sz"))
    // when the (bucket-capped) candidate set is known small, broadcast it so
    // the verify chain never shuffles the shingle index; above the bound we
    // fall back to plain shuffled joins rather than force-broadcasting an
    // unbounded set past autoBroadcastJoinThreshold (driver-OOM hazard)
    val hint: DataFrame => DataFrame = if (broadcastCandidates) broadcast else identity
    val candIds = candidates.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val inv = sh.join(hint(candIds), Seq("id"), "left_semi")
      .select(col("id"), explode(col("sh")).as("shingle"))
    val inter = inv.select(col("shingle"), col("id").as("id_a"))
      .join(inv.select(col("shingle"), col("id").as("id_b")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    scorePairs(hint(candidates).join(inter, Seq("id_a", "id_b")), sizes)
  }

  /** LSH candidate pairs from banded MinHash signatures, verified with exact
    * shingle Jaccard. `bands` must divide `k`. Output: (id_a, id_b, jaccard)
    * with id_a < id_b, for pairs meeting `threshold`.
    *
    * Skew guard: a boilerplate-heavy corpus can put O(m²) candidate pairs in
    * one (band, band_hash) bucket; buckets wider than `maxBucketSize` are
    * dropped from candidate generation (the `maxShingleFreq` mitigation of
    * [[ngramJaccardPairs]], applied to LSH buckets). Capping loses only
    * recall — pairs that collide solely in a capped bucket — never
    * precision, since survivors are still exact-Jaccard verified. The
    * candidate set is broadcast in the verify chain only while its worst
    * case (Σ capped-bucket pair counts) stays within `broadcastPairLimit`. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, k: Int = 8, bands: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 1000,
      broadcastPairLimit: Long = 4000000L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val sh = shingleFrame(df, idCol, textCol, shingleWords)
    val withSig = sh.withColumn("sig", minhashSignature(col("sh"), k))
    // band hash = md5 over the band's slice of the signature. Persisted:
    // (id, band, band_hash) is tiny, and it feeds the bucket-size scan plus
    // both sides of the candidate self-join — without this the signature
    // kernel re-runs three times. Persist the ARRAY frame and explode from
    // the cache: a Generate over an inline expensive projection re-evaluates
    // it per OUTPUT row (see ngramJaccardPairs)
    val bandArrays = withSig.select(col("id"),
      array((0 until bands).map { b =>
        md5(concat_ws("|", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*).cast("binary"))
      }: _*).as("bands"))
      .persist()
    val banded = bandArrays.select(col("id"),
      posexplode(col("bands")).as(Seq("band", "band_hash")))
    val bucketSizes = banded.groupBy("band", "band_hash").agg(count(lit(1)).as("c"))
    val hot = bucketSizes.filter(col("c") > maxBucketSize).select("band", "band_hash")
    // worst-case candidate pairs from the kept buckets — one tiny driver
    // action (O(#buckets) rows) that decides the verify-join strategy
    val pairBound = bucketSizes.filter(col("c") <= maxBucketSize)
      .agg(coalesce(sum(((col("c") * (col("c") - lit(1L))) / 2).cast("long")), lit(0L)))
      .first().getLong(0)
    val cold = banded.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
    val candidates = cold.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(cold.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .persist() // consumed twice in jaccardOfPairs (candidate ids + final join)
    val result =
      jaccardOfPairs(candidates, sh, broadcastCandidates = pairBound <= broadcastPairLimit)
        .filter(col("jaccard") >= threshold)
        .persist()
    result.count(): Unit // materialize, then free every intermediate (see object doc)
    sh.unpersist(); bandArrays.unpersist(); candidates.unpersist()
    result
  }

  /** 32-bit SimHash over distinct word tokens: bit b of the signature is the
    * sign of sum over tokens of (hash32(token) bit b ? +1 : -1). */
  def simhash(textCol: Column): Column = {
    val toks = array_distinct(tokens(textCol))
    val hashes = transform(toks, t => hash32(t))
    (0 until 32).map { b =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Direct n-gram Jaccard pairs via the shared-shingle inverted index —
    * docs never pair unless they share at least one shingle, so the shuffle
    * is keyed by shingle, not doc (no O(n²)). Hot shingles are capped at
    * `maxShingleFreq` to bound skew; when the cap trips, capped shingles are
    * excluded from candidate generation AND intersection counts while set
    * sizes keep them, so reported jaccard is a lower bound (conservative for
    * dedup) — exact whenever no shingle exceeds the cap. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, threshold: Double = 0.2,
      maxShingleFreq: Int = 1000): DataFrame = {
    val sh = shingleFrame(df, idCol, textCol, shingleWords)
    // the exploded index is persisted too — it feeds the hot-shingle scan,
    // the sizes aggregate, and both sides of the intersection self-join
    val inv = sh.select(col("id"), explode(col("sh")).as("shingle")).persist()
    val hot = inv.groupBy("shingle").count().filter(col("count") > maxShingleFreq)
      .select("shingle")
    val cold = inv.join(broadcast(hot), Seq("shingle"), "left_anti")
    // candidate pairs + intersection counts in ONE aggregation over the
    // inverted index — no shingle arrays ever enter a shuffle
    val sizes = inv.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = cold.select(col("shingle"), col("id").as("id_a"))
      .join(cold.select(col("shingle"), col("id").as("id_b")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val result = scorePairs(inter, sizes).filter(col("jaccard") >= threshold).persist()
    result.count(): Unit // materialize, then free every intermediate (see object doc)
    sh.unpersist(); inv.unpersist()
    result
  }

  /** Embedding near-duplicate pairs: cosine >= threshold over LSH-banded
    * candidates. Candidates come from `bands` independent sign-random-
    * projection hash tables of `rowsPerBand` bits each
    * ([[Similarity.lshBandBuckets]] — deterministic MD5 Rademacher planes an
    * SQL oracle regenerates exactly), so vectors only ever meet through an
    * equi-join on (band, bucket): there is no all-pairs/nested-loop join
    * anywhere in the plan. Colliding pairs are verified with the exact
    * cosine kernel; a true pair is missed iff it collides in no band
    * (recall = 1-(1-p^rowsPerBand)^bands, p = 1 - angle/pi — near 1 for
    * genuine near-dups, tune bands up for lower thresholds). Hot buckets
    * (degenerate vectors) are dropped above `maxBucketSize`, mirroring
    * `maxShingleFreq` — capped buckets lower recall, never precision.
    *
    * `bruteForceLimit` > 0 opts small corpora into the exact all-pairs path
    * (one count() to decide); the default never leaves the LSH path. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 12, rowsPerBand: Int = 6, dims: Int = 64,
      maxBucketSize: Int = 1000, bruteForceLimit: Long = 0L): DataFrame = {
    if (bruteForceLimit > 0 && df.count() <= bruteForceLimit)
      return embeddingNearDupExact(df, idCol, vecCol, threshold)
    // persisted: v feeds the bucket build AND both sides of the cosine
    // verification join — unpersisted, each consumer re-reads the source
    // and re-runs the per-vector norm kernel (the fp/qual reuse rule)
    val v = Ops.spread(df).select(col(idCol).as("id"), Similarity.toDouble(col(vecCol)).as("v"))
      .withColumn("n", Similarity.norm(col("v"))) // norm once per vector, not per pair
      .persist()
    // candidate generation carries only (id, band, bucket) — vectors never
    // enter the self-join shuffle
    // persist the bucket ARRAYS and explode from the cache — the generator
    // would otherwise re-evaluate the bands×rowsPerBand dot-product hash
    // per output row (see ngramJaccardPairs)
    val bucketArrays = v.select(col("id"),
      Similarity.lshBandBuckets(col("v"), bands, rowsPerBand, dims).as("bks")).persist()
    val hashed = bucketArrays.select(col("id"),
      posexplode(col("bks")).as(Seq("band", "bucket")))
    val hot = hashed.groupBy("band", "bucket").count()
      .filter(col("count") > maxBucketSize).select("band", "bucket")
    val cold = hashed.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val candidates = cold.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(cold.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val result = candidates
      .join(v.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .persist()
    result.count(): Unit // materialize, then free every intermediate (see object doc)
    bucketArrays.unpersist()
    v.unpersist()
    result
  }

  /** Near-dup CLUSTER formation — the step a dedup pipeline actually ships:
    * pair lists (from [[minhashLshPairs]] / [[ngramJaccardPairs]] /
    * [[embeddingNearDup]]) → connected components → one canonical id per
    * cluster (the min member id, so "keep the representative, drop the
    * rest" is a deterministic filter).
    *
    * The edge list is near-dup-pair-sized — orders of magnitude below the
    * corpus even at 100 TB (edges exist only BETWEEN near-duplicates) — so
    * up to `driverEdgeLimit` edges the components come from a driver-side
    * union-find (one collect of the pair list, microseconds of CPU); the
    * count that picks the path is O(1) driver work. Above the limit the
    * fallback is distributed min-label propagation: each round one shuffle
    * over the edge list, fixpoint when no label changes, rounds = component
    * diameter. Iterative refinements (pointer jumping / large-star) trade
    * MORE shuffles per round for fewer rounds and measured slower here —
    * per-round job latency dominates at edge-list sizes; a graph that is
    * both over the collect limit AND deep-chained pays more rounds, and
    * non-convergence within `maxRounds` throws rather than silently
    * splitting a component.
    *
    * Output: (`idCol`, cluster_id = min member id) for every vertex that
    * appears in at least one pair — singletons are by definition their own
    * cluster and never enter the edge list. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", outIdCol: String = "id", maxRounds: Int = 50,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val idType = pairs.schema(aCol).dataType
    val edges = pairs.select(col(aCol), col(bCol)).persist()
    if (edges.count() <= driverEdgeLimit) {
      // union-find with ITERATIVE path-compressing find (recursion would
      // overflow the driver stack on chain components), min id as root
      val collected = edges.collect()
      edges.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // compress the walked path
        while (c != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      def lt(a: Any, b: Any): Boolean = a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      collected.foreach { r =>
        val (ra, rb) = (find(r.get(0)), find(r.get(1)))
        if (ra != rb) { if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
      }
      val verts = collected.flatMap(r => Seq(r.get(0), r.get(1))).distinct
      val rows = verts.map(v => org.apache.spark.sql.Row(v, find(v))).toSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(outIdCol, idType),
          org.apache.spark.sql.types.StructField("cluster_id", idType))))
    } else {
      val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct().persist()
      var labels = sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")).persist()
      labels.count(): Unit
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < maxRounds) {
        val nbr = sym
          .join(labels.select(col("id").as("src"), col("label").as("src_label")), Seq("src"))
          .groupBy(col("dst").as("id")).agg(min(col("src_label")).as("nbr_label"))
        val next = labels.join(nbr, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
          .persist()
        changed = next.join(labels.withColumnRenamed("label", "old_label"), Seq("id"))
          .filter(col("label") =!= col("old_label")).count()
        labels.unpersist()
        labels = next
        rounds += 1
      }
      sym.unpersist()
      edges.unpersist()
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds " +
            s"($changed labels still changing) — raise maxRounds for deep-chained graphs")
      labels.select(col("id").as(outIdCol), col("label").as("cluster_id"))
    }
  }

  /** Exact all-pairs near-dup baseline — O(n²) nested-loop join, for small
    * corpora (or as the verification spec for the LSH path's precision). */
  def embeddingNearDupExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = Ops.spread(df).select(col(idCol).as("id"), Similarity.toDouble(col(vecCol)).as("v"))
      .withColumn("n", Similarity.norm(col("v")))
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
