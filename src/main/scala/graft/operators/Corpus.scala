package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SqlFunctions.hash32
import graft.functions.TextFunctions
import graft.functions.TextFunctions.{shinglesOfTokens, tokenCount, tokens}

/** Per-document DEFLATE compressibility ([[Corpus.compressionRatio]]). */
case class CompressionStat(doc_id: Long, n_bytes: Long, n_deflate: Long,
    ratio: Option[Double])

/** Corpus-management operators a training-data pipeline needs around the
  * dedup/quality stages: reproducible splits and token-budget packing.
  * Both are pure column logic over content-stable hashes — rerunning on a
  * grown corpus never reassigns an existing document. */
object Corpus {

  /** Deterministic train/validation/test assignment: bucket =
    * md5-hash32(seed ‖ id) mod 100, split by cumulative percentage. Content-
    * stable (a document's split never depends on what else is in the
    * corpus), seed-salted (different seeds give independent assignments),
    * and a pure per-row projection — no shuffle, fully parallel.
    *
    * `cuts` are cumulative upper bounds, e.g. Seq(("train", 80),
    * ("validation", 90), ("test", 100)). */
  def splitAssign(df: DataFrame, idCol: String, seed: String,
      cuts: Seq[(String, Int)] = Seq(("train", 80), ("validation", 90), ("test", 100))
      ): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100, "cuts must end at 100")
    require(cuts.map(_._2) == cuts.map(_._2).sorted && cuts.map(_._2).distinct == cuts.map(_._2),
      "cut upper bounds must be strictly ascending — a mis-ordered cut " +
        "would silently shadow later splits")
    val bucket = pmod(hash32(concat(lit(seed), lit(":"), col(idCol).cast("string"))), lit(100))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, upper), rest) => when(bucket < upper, lit(name)).otherwise(rest)
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** Benchmark decontamination: flag corpus documents that share any word
    * n-gram with a probe set (eval benchmarks, held-out suites). The probe
    * shingle set is benchmark-sized — tiny — so it broadcasts; the corpus
    * side streams through a semi-join keyed by shingle (no doc-side array
    * shuffle, no all-pairs). n = 8 by convention (13 in some published
    * pipelines; lower n → stricter). Returns (idCol, n_hits): the count of
    * distinct probe n-grams found in each contaminated document —
    * uncontaminated documents are absent, so `docs.join(result, semi)` is
    * the drop filter.
    *
    * Cache lifecycle (same convention as [[Dedup]]): the result — sized by
    * the contaminated subset, tiny by construction — is materialized and
    * returned cached, and the corpus shingle frame is freed before
    * returning; `result.unpersist()` when done. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int = 8): DataFrame = {
    val dsh = Dedup.shingleFrame(docs, idCol, textCol, n, outId = idCol)
    val dInv = dsh.select(col(idCol), explode(col("sh")).as("shingle"))
    val psh = probes.select(tokens(col(probeTextCol)).as("__t"))
      .filter(size(col("__t")) >= n)
      .select(explode(shinglesOfTokens(col("__t"), n)).as("shingle")).distinct()
    val result = dInv.join(broadcast(psh), Seq("shingle"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits")) // shingles are per-doc distinct
      .persist()
    result.count(): Unit
    dsh.unpersist()
    result
  }

  /** Corpus token-length audit: doc count, total tokens, and EXACT
    * percentiles of per-document token counts — computed scale-safe via a
    * length histogram (map-side-combinable groupBy over a domain-bounded
    * key) and a cumulative window over that tiny histogram, never a global
    * sort of per-doc rows. Percentile semantics: smallest length whose
    * cumulative doc count reaches ceil(p·n) (percentile_disc) — exactly
    * reproducible in any engine, unlike interpolated or sketch-based
    * quantiles. Output is one row. */
  def tokenStats(df: DataFrame, textCol: String, ps: Seq[Double] = Seq(0.5, 0.95, 0.99)
      ): DataFrame = {
    val names = ps.map(p => s"p${(p * 100).round}")
    require(names.distinct == names,
      s"percentiles render to duplicate column names: $names")
    // NULL text is excluded up front: a NULL length row would sort first in
    // Spark's window but last in SQL engines, silently shifting every
    // cumulative count — and a null doc has no defined token length anyway
    val hist = df.filter(col(textCol).isNotNull)
      .select(tokenCount(col(textCol)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("total", sum(col("c")).over())
    val pcols = ps.zip(names).map { case (p, name) =>
      min(when(col("cum") >= ceil(lit(p) * col("total")), col("n"))).as(name)
    }
    val aggs = sum(col("c")).as("n_docs") +:
      sum(col("n") * col("c")).as("total_tokens") +: pcols
    cum.agg(aggs.head, aggs.tail: _*)
  }

  /** Consecutive NON-overlapping k-token windows — the segment unit for
    * frequency-based span dedup when documents carry no explicit line
    * structure (single-line corpora segment by token window; line-structured
    * corpora can pass `split(text, "\n")` instead). `ts` must be a
    * materialized attribute (binding rule as
    * [[graft.functions.TextFunctions.shinglesOfTokens]]); the last window
    * may be shorter than k. */
  def tokenWindows(ts: Column, k: Int): Column = tokenWindows(ts, k, k)

  /** Strided variant: window i covers tokens [i·stride, i·stride + k); with
    * stride == k the windows tile (segment dedup), with stride < k they
    * overlap (chunking) — ceil(max(n−k,0)/stride)+1 windows for non-empty
    * inputs, every token covered. */
  def tokenWindows(ts: Column, k: Int, stride: Int): Column = {
    require(k > 0 && stride > 0 && stride <= k,
      "need 0 < stride <= window size (a larger stride would skip tokens)")
    when(size(ts) === 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0),
          ceil(greatest(size(ts) - k, lit(0)).cast("double") / stride).cast("int")),
        i => concat_ws(" ", slice(ts, i * stride + 1, lit(k)))))
  }

  /** Corpus-frequency segment dedup — the "remove lines that repeat across
    * many documents" stage of web-corpus pipelines (C4 drops 3-sentence
    * spans seen elsewhere; RefinedWeb/Dolma drop exact repeated lines),
    * generalized to k-token windows via [[tokenWindows]]: any segment whose
    * DISTINCT-document frequency exceeds `maxDocFreq` is boilerplate and is
    * dropped from every document; survivors reassemble in original order.
    *
    * Returns one row per input document — including ones fully emptied:
    * (idCol, n_segs, n_kept, clean_hash = md5 of the reassembled text).
    *
    * Scale shape: segment frequency is a map-side-combinable hash groupBy
    * on the segment STRING (no arrays cross any exchange); the hot set
    * (df > maxDocFreq) is tiny under any Zipfian corpus and sits on the
    * broadcast side of the drop anti-join, so the skewed keys never drive
    * a shuffle partition; reassembly is one shuffle keyed by document id.
    * The segment frame is persisted across its two consumers (frequency +
    * reassembly) behind a generator barrier (see [[Dedup.shingleFrame]]);
    * the small result is returned materialized and the intermediate freed. */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 3, maxDocFreq: Int = 5): DataFrame = {
    val segArr = Ops.spread(docs)
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col(idCol), tokenWindows(col("__t"), windowTokens).as("__segs"))
      .persist()
    try {
      val seg = segArr.select(col(idCol), posexplode(col("__segs")).as(Seq("pos", "seg")))
      val hot = seg.groupBy("seg").agg(countDistinct(col(idCol)).as("df"))
        .filter(col("df") > maxDocFreq).select("seg")
      val kept = seg.join(broadcast(hot), Seq("seg"), "left_anti")
      val re = kept.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg"))).as("__clean"))
      val out = segArr.select(col(idCol), size(col("__segs")).cast("long").as("n_segs"))
        .join(re, Seq(idCol), "left")
        .select(col(idCol), col("n_segs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          md5(coalesce(col("__clean"), lit("")).cast("binary")).as("clean_hash"))
        .persist()
      out.count(): Unit
      out
    } finally segArr.unpersist(): Unit
  }

  /** k-ANONYMITY suppression (Sweeney 2002, re-derived): a row survives
    * only if at least `k` rows share its full quasi-identifier tuple —
    * the release-gating primitive for training data carrying demographic
    * or account-level columns. NULL quasi-values group together
    * (null-safe grouping, matching SQL GROUP BY), so an all-NULL tuple
    * is its own cohort, not a leak.
    *
    * Returns the input rows + `group_n` (cohort size) with sub-k cohorts
    * REMOVED. Pair with an aggregate over the dropped complement for the
    * suppression audit (q115 gates both sides).
    *
    * Scale shape: one window count partitioned by the quasi columns —
    * a single key shuffle at input grain, combinable on the map side;
    * no driver-side state, no joins. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("group_n", count(lit(1)).over(w))
      .filter(col("group_n") >= k)
  }

  /** Substring-level EXACT duplicate detection (the ExactSubstr family of
    * "Deduplicating Training Data Makes Language Models Better", Lee et
    * al. 2021, re-derived for Spark): a k-token window occurring >=
    * `minCount` times ANYWHERE in the corpus (across documents or
    * repeated within one) marks its positions as duplicated; overlapping
    * and adjacent marked windows merge into maximal spans (classic
    * gaps-and-islands: with fixed window length, a new span starts when
    * pos > prevMaxPos + k). Unlike [[Dedup]] doc-level near-dup, this
    * finds VERBATIM reuse inside otherwise-distinct documents — license
    * boilerplate, quoted passages, templated paragraphs.
    *
    * Returns one row per input document: (idCol, n_tokens, dup_tokens =
    * tokens covered by >=1 duplicated window, n_spans = maximal spans).
    *
    * Scale shape: windows shuffle as 8-byte xxhash64 fingerprints, never
    * as strings (at 100 TB the k-token gram text would dominate shuffle
    * bytes ~10×; a 64-bit collision needs ~5·10⁹ distinct grams —
    * birthday-bound safe, and the frequency threshold only OVERCOUNTS on
    * collision, never misses). The frequency pass is one map-side-
    * combinable groupBy; span merging is a per-document window over hit
    * positions only. The gram-array frame persists as the generator
    * barrier (the [[Dedup.shingleFrame]] convention). */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minCount: Long = 2): DataFrame = {
    require(k >= 2, "window must span at least 2 tokens")
    require(minCount >= 2, "minCount < 2 would mark every token duplicated")
    val gramArr = Ops.spread(docs)
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col(idCol), size(col("__t")).cast("long").as("n_tokens"),
        when(size(col("__t")) < k, array().cast("array<bigint>")).otherwise(
          transform(sequence(lit(0), size(col("__t")) - k),
            i => xxhash64(concat_ws(" ", slice(col("__t"), i + 1, lit(k)))))).as("__gh"))
      .persist()
    try {
      val grams = gramArr.select(col(idCol), posexplode(col("__gh")).as(Seq("pos", "g")))
      val dupG = grams.groupBy("g").agg(count(lit(1)).as("c"))
        .filter(col("c") >= minCount).select("g")
      val hits = grams.join(dupG, Seq("g"), "left_semi").select(col(idCol), col("pos"))
      val w = Window.partitionBy(idCol).orderBy("pos")
      val isl = hits
        .withColumn("__pm", max(col("pos")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("__island", sum(
          when(col("__pm").isNull || col("pos") > col("__pm") + k, 1L).otherwise(0L)).over(w))
      val spans = isl.groupBy(col(idCol), col("__island"))
        .agg((max(col("pos")) - min(col("pos")) + k).as("covered"))
      val perDoc = spans.groupBy(idCol)
        .agg(sum(col("covered")).as("dup_tokens"), count(lit(1)).as("n_spans"))
      val out = gramArr.select(col(idCol), col("n_tokens"))
        .join(perDoc, Seq(idCol), "left")
        .select(col(idCol), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"))
        .persist()
      out.count(): Unit
      out
    } finally gramArr.unpersist(): Unit
  }

  /** Remove duplicated spans, KEEPING the corpus-first occurrence of each
    * duplicated window (min (id, pos) in lexicographic order — Lee et
    * al. remove all but one copy; removing every copy would erase the
    * content from the corpus entirely). A token goes if it is covered by
    * a duplicated window whose occurrence lost the argmin race; survivors
    * reassemble in original order. Returns (idCol, n_tokens, n_removed,
    * clean_text).
    *
    * Same shuffle shape as [[duplicateSpans]] plus one reassembly groupBy
    * keyed by document; the argmin is a grouped min over (id, pos)
    * structs — combinable, no extra join. */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minCount: Long = 2): DataFrame = {
    require(k >= 2 && minCount >= 2, "window >= 2 tokens, minCount >= 2")
    val tokArr = Ops.spread(docs)
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .persist()
    try {
      val grams = tokArr
        .select(col(idCol),
          when(size(col("__t")) < k, array().cast("array<bigint>")).otherwise(
            transform(sequence(lit(0), size(col("__t")) - k),
              i => xxhash64(concat_ws(" ", slice(col("__t"), i + 1, lit(k)))))).as("__gh"))
        .select(col(idCol), posexplode(col("__gh")).as(Seq("pos", "g")))
      val byGram = grams.groupBy("g").agg(count(lit(1)).as("c"),
        min(struct(col(idCol), col("pos"))).as("keep"))
      val losers = grams.join(byGram.filter(col("c") >= minCount), Seq("g"))
        .filter(!(col(idCol) === col("keep")(idCol) && col("pos") === col("keep.pos")))
        .select(col(idCol), col("pos"))
      // every token index covered by a losing window, deduplicated
      val removedIdx = losers
        .select(col(idCol), explode(sequence(col("pos"), col("pos") + (k - 1))).as("ix"))
        .distinct()
      val toks = tokArr.select(col(idCol), posexplode(col("__t")).as(Seq("ix", "tok")))
      val keptToks = toks.join(removedIdx, Seq(idCol, "ix"), "left_anti")
      val re = keptToks.groupBy(col(idCol)).agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("ix"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
      val out = tokArr.select(col(idCol), size(col("__t")).cast("long").as("n_tokens"))
        .join(re, Seq(idCol), "left")
        .select(col(idCol), col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .persist()
      out.count(): Unit
      out
    } finally tokArr.unpersist(): Unit
  }

  /** Gopher/C4-style composable document-quality filter: each rule is a
    * named integer flag (1 = pass) so downstream can audit WHY a document
    * was dropped, plus the conjunction as `keep`. Pure per-row projection —
    * no shuffle, fully codegen'd. Rules (all thresholds explicit):
    *  - `r_len`:  minTokens <= token count <= maxTokens (Gopher 50..100k);
    *  - `r_awl`:  mean word length within [minAwl, maxAwl] (Gopher 3..10);
    *  - `r_stop`: stopword ratio >= minStopRatio (Gopher: >= 2 stopwords);
    *  - `r_rep`:  duplicate 2-gram ratio <= maxDupPermille/1000, compared in
    *    INTEGER space (distinct*1000 >= total*(1000-maxDupPermille)) so the
    *    cross-engine contract never rides on float rounding. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 25, maxTokens: Int = 80,
      minAwl: Double = 4.0, maxAwl: Double = 10.0,
      minStopRatio: Double = 0.01, maxDupPermille: Int = 300,
      stopwords: Seq[String] = TextFunctions.LangStopwords.toMap.apply("en")): DataFrame = {
    val t = docs.select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
    val n = size(col("__t")).cast("long")
    val awl = when(n === 0, lit(0.0)).otherwise(
      aggregate(col("__t"), lit(0L), (acc, x) => acc + length(x)).cast("double") / n)
    val grams = TextFunctions.rawShinglesOfTokens(col("__t"), 2)
    val flag = (c: Column) => when(c, lit(1)).otherwise(lit(0))
    val sw = array(stopwords.map(lit): _*)
    val stopRatio = when(n === 0, lit(0.0))
      .otherwise(size(filter(col("__t"), x => array_contains(sw, x))).cast("double") / n)
    t.select(col(idCol), n.as("n_tokens"),
        flag(n >= minTokens && n <= maxTokens).as("r_len"),
        flag(awl >= minAwl && awl <= maxAwl).as("r_awl"),
        flag(stopRatio >= minStopRatio).as("r_stop"),
        flag(size(array_distinct(grams)).cast("long") * 1000 >=
          size(grams).cast("long") * (1000 - maxDupPermille)).as("r_rep"))
      .withColumn("keep",
        flag(col("r_len") === 1 && col("r_awl") === 1 &&
          col("r_stop") === 1 && col("r_rep") === 1))
  }

  /** Deterministic stratified sampling: a document is kept iff
    * hash32(seed ‖ id) mod 10000 falls under its stratum's rate — content-
    * stable (membership never depends on the rest of the corpus, so a
    * grown corpus keeps every previously sampled document), seed-salted,
    * and a pure per-row filter with no shuffle and no driver-side state.
    * `rates` maps stratum value → sampling fraction; unlisted strata use
    * `defaultRate`. Fractions are held at 1/10000 resolution so the
    * threshold comparison is integer-exact in any engine. */
  def sampleStratified(docs: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Double)], defaultRate: Double = 0.0,
      seed: String = "graft"): DataFrame = {
    require(rates.map(_._1).distinct == rates.map(_._1), "duplicate stratum")
    ((defaultRate +: rates.map(_._2)) foreach { r =>
      require(r >= 0.0 && r <= 1.0, s"rate out of [0,1]: $r") })
    val bucket = pmod(hash32(concat(lit(seed), lit(":"), col(idCol).cast("string"))),
      lit(10000))
    val thresh = rates.foldRight(lit((defaultRate * 10000).round.toInt): Column) {
      case ((v, r), rest) =>
        when(col(strataCol) === v, lit((r * 10000).round.toInt)).otherwise(rest)
    }
    // filter on the projected attribute; predicate pushdown may still
    // re-inline the hash into the Filter, but that is a cheap scalar (one
    // md5 of a short string), not the array-generator trap
    docs.withColumn("bucket", bucket).filter(col("bucket") < thresh)
  }

  /** TF-IDF salient terms: the `k` highest-scoring terms per document over
    * the corpus vocabulary. tf = in-document term count, df = distinct-
    * document frequency, idf = ln((N+1)/(df+1)) + 1 (smoothed, the sklearn
    * convention — never zero, so rare terms always outrank stopwords).
    * Scores are rounded to 6 dp BEFORE ranking and ties break on the term
    * string, so the ranking is engine-exact (same contract as the ANN
    * cosine ranking in [[Similarity]]).
    *
    * Scale shape: the canonical distributed inverted-index build — explode
    * behind a persisted generator barrier, then two map-side-combinable
    * hash groupBys (one keyed (doc, term), one keyed term); the df side is
    * vocabulary-sized and joins back on the term key (AQE broadcasts it
    * when small); the final top-k is a per-document window over ~|vocab ∩
    * doc| rows. N comes from one scalar count (S7 driver-action
    * precedent). No token arrays cross an exchange. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = Ops.spread(docs)
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .persist()
    try {
      // 1:1 projection of docs — counting it materializes the cache AND
      // avoids a second scan of the source table
      val n = toks.count()
      val tf = toks.select(col(idCol), explode(col("__t")).as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(df, Seq("term"))
        .withColumn("score",
          round(col("tf") * (log(lit(n + 1.0) / (col("df") + lit(1L))) + lit(1.0)), 6))
      val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
      val out = scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
        .persist()
      out.count(): Unit
      out
    } finally toks.unpersist(): Unit
  }

  /** BM25 top-k retrieval (Robertson & Zaragoza 2009, the Okapi/Lucene
    * formulation): score(d, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf +
    * k1·(1 − b + b·len_d/avgdl)), idf(t) = ln(1 + (N − df + 0.5)/(df +
    * 0.5)). tf counts query terms only; len_d is the full token length;
    * avgdl = Σ len / N. Per-(doc, term) scores are quantized to
    * decimal(24,12) before the per-document sum (order-free exact, the
    * [[crossEntropyScore]] convention), the total rounded to 6 dp BEFORE
    * ranking with doc-id tie-break — so the top-k is engine-exact: every
    * input to the per-row double formula is an exact integer or an exact
    * integer ratio.
    *
    * Scale shape: one tokenize pass persisted behind the generator
    * barrier feeds both consumers — doc lengths (map-side-combinable
    * groupBy) and query-term tf, where the `isin` filter prunes the
    * exploded stream BEFORE its groupBy so only |Q|-term postings ever
    * shuffle (the classic posting-list prune); df is |Q|-sized and
    * broadcast back; the top-k is one window over ≤ N·|Q| scored rows.
    * N and avgdl are two scalar actions (S7 driver-action precedent). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "queryTerms must be non-empty and distinct")
    require(k > 0, "k must be positive")
    val toks = Ops.spread(docs)
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .persist()
    try {
      val n = toks.count()
      val lens = toks.select(col(idCol), size(col("__t")).cast("long").as("len"))
      val totRow = lens.agg(sum(col("len"))).first()
      val tot = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      val avgdl = if (n == 0) 1.0 else tot.toDouble / n
      val tf = toks.select(col(idCol), explode(col("__t")).as("term"))
        .filter(col("term").isin(queryTerms: _*))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val idf = log(lit(1.0) +
        (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / lit(avgdl))
      val termScore = (idf * col("tf") * lit(k1 + 1.0) / (col("tf") + norm))
        .cast("decimal(24,12)")
      val perDoc = tf.join(broadcast(df), Seq("term"))
        .join(lens, Seq(idCol))
        .groupBy(col(idCol), col("len"))
        .agg(count(lit(1)).as("n_terms"), sum(termScore).as("__s"))
        .select(col(idCol), col("len"), col("n_terms"),
          round(col("__s").cast("double"), 6).as("score"))
      // distributed top-k (TakeOrderedAndProject — map-side partial heaps,
      // never a global sort); the rank window then runs over only k rows
      val topk = perDoc.orderBy(col("score").desc, col(idCol)).limit(k)
      val w = Window.orderBy(col("score").desc, col(idCol))
      val out = topk.withColumn("rnk", row_number().over(w)).persist()
      out.count(): Unit
      out
    } finally toks.unpersist(): Unit
  }

  /** Unigram cross-entropy quality score (the shape of CCNet's perplexity
    * filter, with the corpus itself as the language model): score(doc) =
    * −(1/n)·Σ ln p(tᵢ), p(t) = corpus count / corpus total. Low = typical,
    * high = outlier; filter on a threshold or band. Per-token ln values
    * are quantized to decimal(24,12) BEFORE the per-document sum, so the
    * aggregation is order-free exact and the score engine-exact — a raw
    * double sum would vary with partition merge order.
    *
    * Scale shape: term frequencies are one map-side-combinable groupBy;
    * the per-token score join is keyed by term (AQE broadcasts small
    * vocabularies); the per-doc sum is a second combinable groupBy. The
    * token frame is persisted across its two consumers behind the
    * generator barrier. Returns (idCol, n_tokens, xent). */
  def crossEntropyScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Ops.spread(docs)
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .persist()
    try {
      val terms = toks.select(col(idCol), explode(col("__t")).as("term"))
      val freq = terms.groupBy("term").agg(count(lit(1)).as("__c"))
      // an empty / all-empty corpus has a NULL total — no scorable doc
      // exists, so return the (empty) shape instead of dividing by nothing
      val totalRow = freq.agg(sum(col("__c"))).first()
      val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
      val lnp = log(col("__c").cast("double") / lit(total.toDouble))
        .cast("decimal(24,12)")
      val out = terms.join(freq, Seq("term"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_tokens"), sum(lnp).as("__s"))
        .select(col(idCol), col("n_tokens"),
          round(-col("__s").cast("double") / col("n_tokens"), 6).as("xent"))
        .persist()
      out.count(): Unit
      out
    } finally toks.unpersist(): Unit
  }

  /** DSIR-style importance weighting (Xie et al. 2023, data selection via
    * importance resampling): score every document by
    * ln p_target(x) − ln p_raw(x) under hashed n-gram bag-of-words models —
    * the standard recipe for pulling in-domain training data out of a
    * web-scale raw pool (resample ∝ exp(logw), or keep the top slice).
    * `targetFilter` marks the in-domain exemplar docs; grams hash into
    * `buckets` cells (md5-hash32 mod B) and bucket probabilities are add-1
    * smoothed, so unseen buckets never divide by zero. Each gram's
    * log-ratio is the difference of two decimal(24,12)-quantized lns (the
    * [[crossEntropyScore]] convention) — the per-document sum is order-free
    * exact and the 6-dp score engine-exact. Returns (idCol, n_grams, logw);
    * documents with fewer than `n` tokens have no grams and no row.
    *
    * Scale shape: both language models are FIXED B-row bucket tables built
    * by map-side-combinable groupBys (the hashing trick — vocabulary never
    * materializes); the totals are one scalar driver action (S7 precedent);
    * scoring joins the gram stream to the broadcast B-row ratio table and
    * reduces per document — no token arrays cross an exchange, and the
    * bucket frame is persisted across its three consumers. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, n: Int = 2, buckets: Int = 1024): DataFrame = {
    require(n > 0 && buckets > 0, "n and buckets must be positive")
    // Two measured traps here (13 s → 0.5 s on the sf0.1 gram stream):
    // tokens must land in their own projection first — passed inline, every
    // element_at inside the interpreted shingle lambda re-runs the regex
    // split, O(tokens²) per document — and the explode must FUSE with the
    // shingle transform in one Generate (ngramLm's shape): a standalone
    // Project materializing the gram array between codegen'd stages paid
    // ~1 ms/row before the Generate ever saw it.
    val bkt = Ops.spread(docs)
      .select(col(idCol), targetFilter.as("__tgt"),
        tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col(idCol), col("__tgt"),
        explode(TextFunctions.rawShinglesOfTokens(col("__t"), n)).as("__gram"))
      .select(col(idCol), col("__tgt"),
        pmod(hash32(col("__gram")), lit(buckets)).as("bucket"))
      .persist()
    try {
      // both LM bucket tables in ONE conditional aggregation (the separate
      // raw/tgt groupBys + left join paid two extra shuffles for the same
      // ≤`buckets`-row result), and the corpus totals read off the tiny
      // aggregate instead of rescanning the gram stream
      val cnts = bkt.groupBy("bucket").agg(count(lit(1)).as("__cr"),
        count(when(col("__tgt"), lit(1))).as("__ct")).persist()
      try {
        val totals = cnts.agg(sum(col("__cr")), sum(col("__ct"))).first()
        val (nr, nt) =
          if (totals.isNullAt(0)) (0L, 0L) else (totals.getLong(0), totals.getLong(1))
        def lnp(c: Column, total: Long): Column =
          log((c + 1L).cast("double") / lit((total + buckets).toDouble))
            .cast("decimal(24,12)")
        val table = cnts.select(col("bucket"),
          (lnp(col("__ct"), nt) - lnp(col("__cr"), nr)).as("__lr"))
        val out = bkt.join(broadcast(table), Seq("bucket"))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_grams"), sum(col("__lr")).as("__s"))
          .select(col(idCol), col("n_grams"),
            round(col("__s").cast("double"), 6).as("logw"))
          .persist()
        out.count(): Unit
        out
      } finally cnts.unpersist(): Unit
    } finally bkt.unpersist(): Unit
  }

  /** Overlapping token chunks for retrieval/training prep: chunk i covers
    * tokens [i·stride, i·stride + size); the last chunk may be shorter and
    * every token belongs to at least one chunk. Pure per-row generation —
    * the chunk count is ceil(max(n−size,0)/stride)+1 for non-empty docs.
    * Returns (idCol, chunk_ix, n_chunk_tokens, chunk_hash). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 32, stride: Int = 24): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (stride > size would skip tokens)")
    val arr = Ops.spread(docs)
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__t"))
      // __t is NOT carried into the persisted frame — the chunks duplicate
      // its content, so caching both would double the footprint
      .select(col(idCol), tokenWindows(col("__t"), size, stride).as("__chunks"))
      .persist()
    try {
      val out = arr
        .select(col(idCol), posexplode(col("__chunks")).as(Seq("chunk_ix", "__chunk")))
        .select(col(idCol), col("chunk_ix"),
          size_(tokens(col("__chunk"))).cast("long").as("n_chunk_tokens"),
          md5(col("__chunk").cast("binary")).as("chunk_hash"))
        .persist()
      out.count(): Unit
      out
    } finally arr.unpersist(): Unit
  }

  // functions.size shadowed by the method parameter name in chunkTokens
  private def size_(c: Column): Column = size(c)

  /** Content-defined chunking (the rsync/FastCDC cut rule lifted to token
    * streams): a chunk ends after any token whose md5-hash32 ≡ 0 (mod
    * `mod`), giving chunks of ~`mod` tokens on average whose IDENTITY
    * depends only on their own content — an insertion re-keys chunks only
    * up to the next boundary, where fixed windows ([[chunkTokens]]) shift
    * and re-key every later chunk. That stability is why chunk-level dedup
    * over evolving corpora (web recrawls, versioned documents) uses CDC
    * cuts. Returns one row per chunk: (idCol, chunk_no, n_chunk_tokens,
    * chunk_hash = md5 of the space-joined chunk); empty documents yield no
    * rows; a trailing partial chunk is kept.
    *
    * Scale shape: the cut rule is content-LOCAL, so chunking needs no
    * window and no shuffle — the whole operator is a per-row array fold
    * (one md5 per token) followed by a generator, ZERO exchanges end to
    * end; the fold's running-chunk append is O(chunk length) per token,
    * bounded by the ~mod-token chunk size. The chunk-array frame is
    * persisted before exploding (the generator-inlining rule,
    * [[Dedup.shingleFrame]]). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      mod: Int = 16): DataFrame = {
    require(mod > 0, "mod must be positive")
    val emptyChunks = array().cast("array<array<string>>")
    val chunks = aggregate(
      tokens(coalesce(col(textCol), lit(""))),
      struct(emptyChunks.as("done"), array().cast("array<string>").as("cur")),
      (acc, t) => {
        val cur2 = concat(acc.getField("cur"), array(t))
        when(pmod(hash32(t), lit(mod)) === 0,
          struct(concat(acc.getField("done"), array(cur2)).as("done"),
            array().cast("array<string>").as("cur")))
          .otherwise(struct(acc.getField("done").as("done"), cur2.as("cur")))
      },
      acc => when(size(acc.getField("cur")) > 0,
        concat(acc.getField("done"), array(acc.getField("cur"))))
        .otherwise(acc.getField("done")))
    val arr = Ops.spread(docs)
      .select(col(idCol), chunks.as("__chunks")).persist()
    try {
      val out = arr
        .select(col(idCol), posexplode(col("__chunks")).as(Seq("chunk_no", "__chunk")))
        .select(col(idCol), col("chunk_no").cast("long").as("chunk_no"),
          size_(col("__chunk")).cast("long").as("n_chunk_tokens"),
          md5(concat_ws(" ", col("__chunk")).cast("binary")).as("chunk_hash"))
        .persist()
      out.count(): Unit
      out
    } finally arr.unpersist(): Unit
  }

  /** Exact quantile-bucket assignment without a global row sort (the
    * curriculum/difficulty-binning stage: order documents by a quality or
    * perplexity score, train easy-to-hard): row's bucket =
    * ⌈q · |rows with score ≤ mine| / n⌉, computed in INTEGER space
    * ((q·cum + n − 1) div n) so no engine's float rounding can shift a
    * boundary. Ties share a bucket by construction — the assignment is a
    * pure function of the score value, deterministic in any engine. Rows
    * with NULL score join nothing and are dropped (no defined rank).
    *
    * Scale shape: the same histogram trick as [[tokenStats]] — one
    * map-side-combinable groupBy to the distinct-score histogram, a
    * cumulative window over THAT (histogram-sized: scores are rounded
    * upstream, ~10⁶ distinct cells at 6 dp, never corpus rows), then an
    * equi-join back on the score value (AQE broadcasts small histograms).
    * A global `ntile` window would sort the whole corpus on one
    * partition; this never moves more than the histogram. */
  def quantileBuckets(df: DataFrame, scoreCol: String, q: Int = 10): DataFrame = {
    require(q > 0, "q must be positive")
    val hist = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over())
      .select(col(scoreCol),
        expr(s"($q * __cum + __n - 1) div __n").cast("int").as("bucket"))
    df.join(cum, Seq(scoreCol))
  }

  /** Per-stratum quota capping (corpus balancing): keep at most
    * `maxPerStratum` documents per stratum, chosen by seeded hash order
    * (id tie-break) so the survivor set is deterministic and approximately
    * uniform — the "cap any one domain's share" stage of web pipelines.
    * One window per stratum, never a global sort.
    * Returns kept rows: (idCol, strataCol, rn). */
  def stratumQuota(docs: DataFrame, idCol: String, strataCol: String,
      maxPerStratum: Int, seed: String = "graft"): DataFrame = {
    require(maxPerStratum > 0, "maxPerStratum must be positive")
    val h = hash32(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    docs.select(col(idCol), col(strataCol))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPerStratum)
  }

  /** End-to-end corpus refinery: the standard pretraining-data sequence —
    * quality filter → exact dedup → benchmark decontamination → split
    * assignment — composed from this engine's stage operators, with a
    * FIRST-FAILING-STAGE disposition per document (the audit trail a data
    * pipeline must keep: why a document left, not just that it vanished).
    * Cohort rule: exact dedup elects its survivor (lowest id per
    * fingerprint) among QUALITY-PASSING documents only — a duplicate of a
    * rejected doc is judged on its own; decontamination and split are
    * per-document against external inputs, so they commute with masking.
    * Returns one row per input document:
    * (idCol, status ∈ quality | exact_dup | contaminated | kept,
    *  split — NULL unless kept).
    *
    * Scale shape: every stage is an already-audited operator — per-row
    * quality rules, a map-side-combinable fingerprint groupBy, the
    * broadcast-probe shingle semi-join, and a pure hash projection — glued
    * by equi-joins on the document id; the input projection is persisted
    * across the stage consumers and freed on return. */
  def refine(docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String): DataFrame = {
    val base = Ops.spread(docs.select(col(idCol), col(textCol))).persist()
    // the two CPU kernels — the quality HOF heuristics and the regex
    // fingerprint — feed MULTIPLE consumers below (qual: the keep-filter
    // into fp plus the final status join; fp: the winner groupBy plus the
    // dup join), and both shrink to id-sized frames. Persist them for the
    // operator's lifetime or every consumer re-runs the whole text kernel
    // over the corpus (measured: the unpersisted plan re-evaluated the
    // quality stage 3x, ~100 s of task CPU at sf0.1 vs ~15 s isolated)
    val qual = qualityFilter(base, idCol, textCol)
      .select(col(idCol), col("keep")).persist()
    val fp = base
      .select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("__fp"))
      .join(qual.filter(col("keep") === 1), Seq(idCol)).persist()
    try {
      val win = fp.groupBy("__fp").agg(min(col(idCol)).as("__win"))
      val dups = fp.join(win, Seq("__fp")).filter(col(idCol) =!= col("__win"))
        .select(col(idCol), lit(1).as("__dup"))
      val cont = decontaminate(base, idCol, textCol, probes, probeTextCol, n = 8)
      val contIds = cont.select(col(idCol), lit(1).as("__cont"))
      val splits = splitAssign(base.select(col(idCol)), idCol, seed = "graft")
        .select(col(idCol), col("split").as("__split"))
      val status = when(col("keep") === 0, "quality")
        .when(col("__dup") === 1, "exact_dup") // NULL (no match) falls through
        .when(col("__cont") === 1, "contaminated")
        .otherwise("kept")
      val out = base.select(col(idCol))
        .join(qual, Seq(idCol))
        .join(dups, Seq(idCol), "left")
        .join(contIds, Seq(idCol), "left")
        .join(splits, Seq(idCol))
        .withColumn("status", status)
        .select(col(idCol), col("status"),
          when(col("status") === "kept", col("__split"))
            .otherwise(lit(null).cast("string")).as("split"))
        .persist()
      out.count(): Unit
      cont.unpersist()
      out
    } finally {
      fp.unpersist()
      qual.unpersist()
      base.unpersist(): Unit
    }
  }

  /** Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005): a
    * `depth` × `width` grid of counters, cell (r, b) counting every token
    * whose r-th hash lands in bucket b; a token's estimate is the MIN over
    * its depth cells — always ≥ its true count, within εN with probability
    * 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. Hashing is the engine-wide
    * md5-hash32 ("r:token"), so any engine rebuilds the identical grid.
    * Returns the top-`k` candidate tokens by (estimate desc, token):
    * (item, n_exact, n_est, rnk) — n_est ≥ n_exact by construction, and
    * emitting both exhibits the one-sided error the sketch guarantees.
    *
    * Scale shape: the grid build replicates token rows ×depth (a constant)
    * and partial-aggregates map-side — the exchange carries at most
    * partitions × depth × width rows, and the grid itself is a fixed
    * depth × width relation (mergeable across any corpus split, the reason
    * sketches exist); candidates come from one combinable vocabulary
    * groupBy, pruned by `minSupport` BEFORE estimation so the broadcast
    * join against the grid and the final top-k window see only the pruned
    * candidate set, never the corpus. */
  def heavyHittersCms(docs: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 256, k: Int = 20, minSupport: Long = 1L): DataFrame = {
    require(depth > 0 && width > 0 && k > 0, "depth, width, k must be positive")
    val toks = Ops.spread(docs)
      .select(tokens(coalesce(col(textCol), lit(""))).as("__t")).persist()
    try {
      val items = toks.select(explode(col("__t")).as("item"))
      // replicate rows BEFORE hashing (the exploded array is a foldable
      // constant, so generator re-evaluation is free — one md5 per
      // (item, r), not depth² of them)
      def withBucket(df: DataFrame) = df
        .select(col("*"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
        .withColumn("bucket",
          pmod(hash32(concat(col("r").cast("string"), lit(":"), col("item"))), lit(width)))
      val cells = withBucket(items).groupBy("r", "bucket").agg(count(lit(1)).as("__c"))
      val cand = items.groupBy("item").agg(count(lit(1)).as("n_exact"))
        .filter(col("n_exact") >= minSupport)
      val est = withBucket(cand).join(broadcast(cells), Seq("r", "bucket"))
        .groupBy(col("item"), col("n_exact")).agg(min(col("__c")).as("n_est"))
      // global window over the PRUNED candidate set only (vocabulary-sized
      // at worst, minSupport-bounded in practice — never corpus rows)
      val w = Window.orderBy(col("n_est").desc, col("item"))
      val out = est.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
        .persist()
      out.count(): Unit
      out
    } finally toks.unpersist(): Unit
  }

  /** PII patterns shared with the oracle formulation: plain character
    * classes, quantifiers, and `\b` only — the subset where Java regex
    * (Spark) and RE2 (DuckDB) agree. No lookaround (RE2 has none), no
    * backreferences. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** PII redaction (the pre-training scrub pass): replace emails, IPv4
    * addresses, and phone-shaped numbers with typed placeholder tokens and
    * report per-document match counts. Patterns apply in a fixed order
    * (email → ip → phone): a token matching several patterns is consumed
    * by the earliest pass — e.g. `call 555-123-4567` inside an already-
    * redacted span stays gone, and digit runs inside an email's local part
    * never surface as phone fragments. (An IP-shaped domain like
    * `user@1.2.3.4` is NOT an email under EmailRe — the TLD must be
    * alphabetic — so the IP pass claims its address part.) Each count is
    * taken on the PROGRESSIVELY-redacted text (pass i counts after
    * replacements 1..i−1 have been applied), so n_emails + n_ips +
    * n_phones always equals the number of placeholder tokens emitted —
    * a span consumed by an earlier pass can never be double-counted by a
    * later one.
    *
    * Scale shape: pure per-row projection — no shuffle, codegen'd regex
    * kernels, scales with input splits. */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    docs.select(col(idCol),
      regexp_replace(t2, PhoneRe, "<PHONE>").as("redacted"),
      regexp_count(t0, lit(EmailRe)).as("n_emails"),
      regexp_count(t1, lit(Ipv4Re)).as("n_ips"),
      regexp_count(t2, lit(PhoneRe)).as("n_phones"))
  }

  /** Markup patterns shared with the oracle: plain classes only — the
    * Java-regex/RE2 common subset, like the PII patterns above. */
  val TagRe = "<[^>]*>"
  val EntityRe = "&(amp|lt|gt|quot|#39|nbsp);"

  /** HTML/markup cleaning (the pre-training boilerplate scrub): strip
    * tags, decode the six common entities, collapse whitespace runs, trim;
    * report per-document tag and entity counts. Decode order is the
    * standard double-decode guard — `&amp;` decodes LAST, so `&amp;lt;`
    * yields the literal text `&lt;` instead of `<` (one layer per pass,
    * exactly like an HTML parser's entity stage). Counts are taken on the
    * tag-stripped text BEFORE any decode (leftmost non-overlapping, so
    * `&amp;lt;` counts once — the `&amp;`).
    *
    * Scale shape: pure per-row projection — codegen'd regex kernels, no
    * shuffle, scales with input splits (same as [[redactPii]]). */
  def cleanMarkup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    val t1 = regexp_replace(t0, TagRe, " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(t1) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }
    docs.select(col(idCol),
      trim(regexp_replace(decoded, "\\s+", " ")).as("cleaned"),
      regexp_count(t0, lit(TagRe)).as("n_tags"),
      regexp_count(t1, lit(EntityRe)).as("n_entities"))
  }

  /** Opt-out erasure — the deletion-list pass a compliant pretraining
    * pipeline runs before every release (takedown requests, robots
    * opt-outs, licensing removals): a document is removed when its ID is
    * on the id list OR its content fingerprint (the [[Dedup]] family's
    * normalized md5, so an opted-out text removes ALL byte-variant copies)
    * is on the content list. Returns every document with a
    * `removed_reason` column — 'id', 'content', or NULL for kept — so the
    * caller both filters and audits from one pass; id-match wins when
    * both apply (deterministic reason).
    *
    * Scale shape: deletion lists are human-scale — both broadcast; the
    * corpus passes once with two broadcast left joins and no shuffle of
    * its own. */
  def applyOptOut(docs: DataFrame, idCol: String, textCol: String,
      optOutIds: DataFrame, optOutFps: DataFrame): DataFrame = {
    val ids = optOutIds.select(col(optOutIds.columns.head).as(idCol)).distinct()
      .withColumn("__by_id", lit(1))
    val fps = optOutFps.select(col(optOutFps.columns.head).as("__fp")).distinct()
      .withColumn("__by_fp", lit(1))
    docs
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .join(broadcast(ids), Seq(idCol), "left")
      .join(broadcast(fps), Seq("__fp"), "left")
      .withColumn("removed_reason",
        when(col("__by_id").isNotNull, lit("id"))
          .when(col("__by_fp").isNotNull, lit("content")))
      .drop("__fp", "__by_id", "__by_fp")
  }

  /** Linear quality classifier (the fasttext-style scorer of pretraining
    * filters, reduced to its deterministic core): a fixed-weight linear
    * model over the [[graft.functions.TextFunctions]] feature set,
    * emitting the LOGIT (6-dp) and its sign as the keep label. The
    * weights here are documented literals — a trained model's weights are
    * a drop-in swap, same as the IVF centroid table — and the logit is
    * reported instead of a sigmoid probability because the affine form is
    * bit-reproducible across engines while `exp` is libm-dependent.
    *
    * z = −1.5 + 0.002·min(tokens, 2000) + 0.8·stopword_ratio
    *     − 2.0·punct_ratio + 0.1·avg_word_len
    *
    * Scale shape: pure per-row projection, no shuffle. */
  def qualityLogit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions._
    val toks = tokenCount(col(textCol)).cast("double")
    val z = lit(-1.5) +
      lit(0.002) * least(toks, lit(2000.0)) +
      lit(0.8) * stopwordRatio(col(textCol), EnStop) -
      lit(2.0) * punctRatio(col(textCol)) +
      lit(0.1) * avgWordLen(col(textCol))
    docs.select(col(idCol), round(z, 6).as("logit"), (z > 0).as("keep"))
  }

  /** Temperature-scaled source mixing weights (the multinomial-sampling
    * rule of multilingual/multi-source pretraining, Conneau & Lample 2019):
    * per stratum, p = token share of the corpus, weight w = p^α / Σp^α.
    * α = 1 keeps natural proportions; α → 0 flattens toward uniform,
    * upweighting low-resource strata. Weights round to 6 dp (the
    * cross-engine double convention).
    *
    * Scale shape: one map-side-combinable aggregation to stratum grain
    * (#strata rows — sources/languages, bounded by reality), then the
    * normalization runs in an unpartitioned window over those few rows.
    * The corpus itself is never rescanned or shuffled. */
  def mixtureWeights(docs: DataFrame, strataCol: String, textCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val per = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount(col(textCol))).as("n_tokens"))
    val all = Window.partitionBy()
    per
      .withColumn("__p", col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(all).cast("double"))
      .withColumn("__pa", pow(col("__p"), lit(alpha)))
      .withColumn("weight", round(col("__pa") / sum(col("__pa")).over(all), 6))
      .drop("__p", "__pa")
  }

  /** Corpus n-gram language model, conditional form: for every (n−1)-token
    * prefix, the top-`k` next tokens by occurrence count with conditional
    * probability count/Σcount(prefix) (6-dp, the cross-engine double
    * convention) and a dense 1..k rank (count desc, token asc tiebreak).
    * `minPrefixTotal` prunes rare prefixes — at corpus scale the long tail
    * of singleton prefixes dominates row count while carrying no signal.
    *
    * Scale shape: gram extraction is a per-row generator (no doc-side
    * array ever enters an exchange — the q24/q26 rule); counting is one
    * map-side-combinable groupBy on (prefix, next); the probability
    * normalizer and top-k run in ONE window partitioned by prefix over
    * prefix-grain counted rows, never corpus rows. Hot prefixes (stopword
    * bigrams) are bounded by vocabulary, not corpus size — the window
    * input per prefix is its distinct-next count. */
  def ngramLm(docs: DataFrame, textCol: String, n: Int = 2, k: Int = 3,
      minPrefixTotal: Long = 1L): DataFrame = {
    require(n >= 2, s"ngramLm needs n >= 2, got $n")
    require(k > 0, s"k must be positive, got $k")
    val grams = Ops.spread(docs)
      .select(tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .filter(size(col("__t")) >= n)
      .select(explode(TextFunctions.rawShinglesOfTokens(col("__t"), n)).as("g"))
      // tokens are whitespace-split, so the last space splits prefix | next
      .select(substring_index(col("g"), " ", n - 1).as("prefix"),
        substring_index(col("g"), " ", -1).as("next_tok"))
    val counts = grams.groupBy(col("prefix"), col("next_tok"))
      .agg(count(lit(1)).as("cnt"))
    val wp = Window.partitionBy(col("prefix"))
    val wr = Window.partitionBy(col("prefix")).orderBy(col("cnt").desc, col("next_tok"))
    counts
      .withColumn("prefix_total", sum(col("cnt")).over(wp))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= k && col("prefix_total") >= minPrefixTotal)
      .select(col("prefix"), col("next_tok"), col("cnt"), col("prefix_total"),
        round(col("cnt").cast("double") / col("prefix_total"), 6).as("prob"),
        col("rnk"))
  }

  /** Incremental exact dedup against a persisted fingerprint state table —
    * the steady-state form of [[Dedup.exact]] for a corpus ingested in
    * batches (recrawls, daily drops): a document is kept iff its content
    * fingerprint was never seen in ANY earlier batch, with min-id-wins
    * inside the batch. Returns this batch's newly kept (fp, keep_id) and
    * appends them to the state table via the atomic writer (crash-safe;
    * re-running the same batch converges because the state upsert is
    * keyed by fp).
    *
    * Scale shape: the batch collapses to fingerprint grain map-side
    * first, so the join grain is fp vs fp — never document payloads. The
    * state side is only ever SCANNED: a Bloom filter built FROM the batch
    * ([[Ops.bloomProbe]], no false negatives) kills definite non-members
    * of the batch in the state's scan stage, so the rows reaching the
    * state-side exchange are ~|batch ∩ state| plus the false-positive
    * residue — the full fingerprint history is never reshuffled, no
    * matter how large it grows (size `bloomBits` ≳ 10× the batch's
    * distinct fps for ~1-2% FP). New fingerprints APPEND (they are
    * absent from state by construction — the anti-join is the proof), so
    * the steady-state write is O(|fresh|), not a table rewrite. For a
    * state table big enough that even its scan should skip shuffling
    * work, see [[dedupIncrementalBucketed]]. */
  def dedupIncremental(spark: org.apache.spark.sql.SparkSession, statePath: String,
      docs: DataFrame, idCol: String, textCol: String,
      bloomBits: Int = 1 << 20): DataFrame = {
    // NULL text coalesces to "" BEFORE fingerprinting: a NULL fp would
    // break the whole state contract — the left_anti below never matches
    // NULL against NULL, so every batch would re-keep its null-text doc
    // (and an SQL mirror's NOT IN goes the other way, emptying the batch).
    // For dedup identity, a null document and an empty one are the same
    // content
    val batch = Dedup.exact(
      docs.withColumn(textCol, coalesce(col(textCol), lit(""))), idCol, textCol)
      .select(col("fp"), col("keep_id"))
      // pinned: the bloom build, the anti-join, and the append below all
      // consume it — without this the fingerprint groupBy would run thrice
      .localCheckpoint(true)
    val state = graft.core.TableIO.readOrEmpty(spark, statePath, batch)
    // localCheckpoint, not persist: it pins the result BEFORE the state
    // write below changes the files the plan reads, and it DETACHES the
    // lineage — a persisted plan would sit in the CacheManager still keyed
    // on the state path and silently serve this batch's rows to the next
    // call's identical-looking anti-join over the now-changed state
    val fresh = freshAgainstState(batch, state, bloomBits).localCheckpoint(true)
    // append, not upsert: re-running a crashed batch converges because the
    // already-appended fps anti-join the rerun's batch down to the missing
    // remainder (fp-keyed state is insert-only)
    fresh.write.mode("append").parquet(statePath)
    fresh
  }

  /** The per-batch freshness plan, factored so PlanAudit can pin its
    * shape: `batch LeftAnti state` with [[Ops.bloomProbe]](batch) pushed
    * into the state side's scan stage. Exact despite the lossy filter —
    * Bloom false negatives are impossible, so every state fp that could
    * match a batch fp survives to the anti-join; false positives merely
    * ride along and fail to match. */
  private[graft] def freshAgainstState(batch: DataFrame, state: DataFrame,
      bloomBits: Int): DataFrame = {
    val pruned = state.filter(Ops.bloomProbe(batch, "fp", col("fp"), bloomBits))
    batch.join(pruned, Seq("fp"), "left_anti")
  }

  /** Bucketed-state incremental dedup — the standing-table layout answer
    * for when the fingerprint state outgrows per-batch scan-and-shuffle:
    * state persists as a [[graft.core.TableIO.writeBucketed]] catalog
    * table hash-clustered on fp, so the anti-join reads state CO-LOCATED
    * (the only exchange in the plan is the batch side shuffling to the
    * bucket count — CorpusSpec pins `Bucketed: true` + single-exchange),
    * and each batch's new fingerprints append one file per bucket instead
    * of rewriting the table. Same keep semantics as [[dedupIncremental]]
    * (min id wins in-batch, first batch wins across batches); pick the
    * bucket count for the target state size, not the batch size. */
  def dedupIncrementalBucketed(spark: org.apache.spark.sql.SparkSession,
      stateTable: String, docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = 64): DataFrame = {
    val batch = Dedup.exact(
      docs.withColumn(textCol, coalesce(col(textCol), lit(""))), idCol, textCol)
      .select(col("fp"), col("keep_id"))
    val known = spark.catalog.tableExists(stateTable)
    val fresh =
      if (!known) batch.localCheckpoint(true)
      else batch.join(spark.table(stateTable), Seq("fp"), "left_anti")
        .localCheckpoint(true) // detach lineage before appending to the table it read
    if (!known)
      graft.core.TableIO.writeBucketed(fresh, stateTable, Seq("fp"), numBuckets, Seq("fp"))
    else fresh.write.mode("append").format("parquet")
      .bucketBy(numBuckets, "fp").sortBy("fp").saveAsTable(stateTable)
    fresh
  }

  /** Token-budget packing: assign documents to bins of roughly `budget`
    * tokens for sequence packing. Documents are sharded by id hash (the
    * scale axis — each shard packs independently, so the window never sees
    * more than corpus/shards rows), then packed contiguously in id order:
    * a document belongs to the bin in which its running token total
    * started. Deterministic and engine-independent; bins can overflow by
    * at most one document (the straddler stays in the bin it started in) —
    * the standard streaming-packing tradeoff, and an oversized document
    * owns its bins alone. */
  def packByTokenBudget(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int = 256): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), tokenCount(col(textCol)).as("tokens"))
      .withColumn("shard", pmod(hash32(col(idCol).cast("string")), lit(shards)))
      .withColumn("bin",
        floor((sum(col("tokens")).over(w) - col("tokens")) / budget).cast("long"))
  }

  /** DEFLATE compressibility per document — the MassiveText/Gopher-family
    * quality signal the regex stats can't fake: heavily repetitive or
    * templated text compresses far below prose, random noise barely at
    * all, so `ratio = deflate_bytes / utf8_bytes` separates boilerplate
    * (low), natural text (middle), and binary-ish junk (high ≈ 1). Zero-
    * byte documents get a NULL ratio (no defined compressibility).
    * Rounded to 6 dp (HALF_UP, the engine's own convention).
    *
    * Gate shape: DuckDB has no zlib surface, so the driver check is
    * rows-only; `CorpusSpec` pins the kernel instead (separation on
    * planted fixtures, UTF-8 byte accounting, empty-input NULL,
    * run-to-run determinism — DEFLATE at a fixed level in one JVM is a
    * pure function of the bytes).
    *
    * Scale shape: a per-partition `Deflater` handle streamed over the
    * iterator ([[graft.multimodal.Multimodal]]'s decoder pattern) — one
    * native allocation per task, no shuffle, scales with input splits. */
  def compressionRatio(docs: DataFrame, idCol: String, textCol: String,
      level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level must be in [1, 9], got $level")
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          defl.reset(); defl.setInput(bytes); defl.finish()
          var n = 0L
          while (!defl.finished()) n += defl.deflate(buf)
          val ratio = if (bytes.isEmpty) None
            else Some(BigDecimal(n.toDouble / bytes.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          CompressionStat(id, bytes.length.toLong, n, ratio)
        } ++ { defl.end(); Iterator.empty } // free native memory at exhaustion
      }
      .toDF("doc_id", "n_bytes", "n_deflate", "ratio")
  }

  /** Deterministic LZ77-STYLE compressibility proxy: over a bounded
    * prefix (`prefixChars`, so a pathological 1 GB row can't blow task
    * memory materializing its gram array), count total vs DISTINCT
    * character `gram`-grams. `grams_distinct / grams_total` is exactly
    * the fraction of positions an LZ77 coder could NOT copy from an
    * earlier occurrence — boilerplate scores low, prose high — which
    * makes it the SQL-expressible stand-in for [[compressionRatio]]'s
    * DEFLATE ratio (that kernel stays the sharper signal, gated by
    * CorpusSpec; this one is integer-exact in ANY engine, so the
    * cross-engine oracle can replay it bit-for-bit). Per-row compute,
    * zero shuffle. NULL text counts as empty. */
  def ngramCompressibility(docs: DataFrame, idCol: String, textCol: String,
      gram: Int = 8, prefixChars: Int = 4096): DataFrame = {
    require(gram >= 2, s"gram must be >= 2, got $gram")
    require(prefixChars >= gram, s"prefixChars must be >= gram")
    val g = gram
    docs.select(col(idCol).cast("long").as("doc_id"),
      substring(coalesce(col(textCol), lit("")), 1, prefixChars).as("__t"))
      .select(col("doc_id"),
        greatest(length(col("__t")) - (g - 1), lit(0)).cast("long").as("grams_total"),
        size(array_distinct(expr(
          s"IF(length(__t) >= $g, transform(sequence(1, length(__t) - ${g - 1}), " +
            s"i -> substring(__t, i, $g)), array())"))).cast("long").as("grams_distinct"))
  }
}
