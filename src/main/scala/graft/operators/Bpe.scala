package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding tokenizer TRAINING and application — the
  * vocabulary-building stage of an LLM data pipeline (Sennrich et al.
  * 2016), structured the way production trainers are:
  *
  *  - the ONLY corpus-scale pass is one map-side-combinable word-count
  *    groupBy (corpus → (word, freq) at vocabulary grain);
  *  - merge learning then runs on the driver over the vocabulary table —
  *    legitimately driver-sized (Zipf: the word-frequency table of even a
  *    100 TB corpus is millions of rows, and `minWordFreq` prunes the
  *    noise tail; a hard `maxVocabWords` guard fails loudly rather than
  *    silently truncating);
  *  - encoding is a pure per-partition map with a broadcast merge table
  *    and per-partition word memoization — no shuffle, linear scale-out.
  *
  * Determinism contract (what the specs pin): pair selection is by
  * (count DESC, (left, right) lexicographically ASC); merges apply
  * left-to-right non-overlapping; training stops early when the best
  * pair's count < 2 (merging singletons builds no generalizing vocab).
  * Encoding applies merges in rank order through the SAME single-merge
  * kernel training uses, so encode(training corpus) reproduces the
  * trained symbol states by construction.
  */
object Bpe {

  /** End-of-word sentinel (distinct from any single character). */
  val EndWord = "</w>"

  case class Merge(rank: Int, left: String, right: String, pair_count: Long)
  case class BpeDoc(doc_id: Long, n_words: Long, n_bpe_tokens: Long, bpe_hash: String)

  /** A word as its initial symbol sequence: Unicode code points + the
    * end-of-word sentinel. */
  private[operators] def symbols(w: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b += EndWord
    b.result()
  }

  /** One merge applied left-to-right, non-overlapping — shared by
    * training and encoding so their state evolution is identical. */
  private[operators] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge
    * table (rank, left, right, pair_count), possibly shorter than
    * requested (early stop when no pair repeats). `minWordFreq` prunes
    * the rare-word tail BEFORE the driver collect; `maxVocabWords` is a
    * loud guard on driver memory, not a silent cap. */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
      minWordFreq: Long = 1, maxVocabWords: Int = 2000000): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    val wcDf = docs.select(explode(tokens(coalesce(col(textCol), lit("")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minWordFreq)
    val wc = wcDf.collect().map(r => (r.getString(0), r.getLong(1)))
    require(wc.length <= maxVocabWords,
      s"vocabulary has ${wc.length} words > maxVocabWords=$maxVocabWords — " +
        "raise the cap or raise minWordFreq (silent truncation would bias the merges)")
    var vocab: Array[(Array[String], Long)] = wc.map { case (w, c) => (symbols(w), c) }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < 2) done = true
        else {
          merges += Merge(rank, l, r, c)
          vocab = vocab.map { case (syms, wc) =>
            var i = 0
            var hit = false
            while (!hit && i + 1 < syms.length) {
              hit = syms(i) == l && syms(i + 1) == r; i += 1
            }
            (if (hit) applyMerge(syms, l, r) else syms, wc)
          }
          rank += 1
        }
      }
    }
    import spark.implicits._
    merges.result().toDF()
  }

  case class BpeWord(word: String, n_tokens: Long, toks: String)

  /** The corpus's distinct words, each encoded with a learned merge
    * table: (word, n_tokens, toks = space-joined token stream). This IS
    * the per-word half of [[applyBpe]] materialized as a relation, which
    * makes document encoding SQL-expressible downstream: split a
    * document into words, join each against this table, aggregate — the
    * structure the q109/q116 DuckDB oracles verify. Scale shape: one
    * combinable distinct at vocabulary grain, then the same broadcast-
    * merges per-partition encode as [[applyBpe]] — no shuffle past the
    * distinct. */
  def encodeWords(docs: DataFrame, textCol: String, merges: DataFrame): Dataset[BpeWord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeList: Array[(String, String)] = merges.select("rank", "left", "right")
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    val bc = spark.sparkContext.broadcast(mergeList)
    docs.select(explode(tokens(coalesce(col(textCol), lit("")))).as("w"))
      .distinct().as[String]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { w =>
          var syms = symbols(w)
          ms.foreach { case (l, r) =>
            var i = 0
            var hit = false
            while (!hit && i + 1 < syms.length) {
              hit = syms(i) == l && syms(i + 1) == r; i += 1
            }
            if (hit) syms = applyMerge(syms, l, r)
          }
          BpeWord(w, syms.length.toLong, syms.mkString(" "))
        }
      }
  }

  /** Encode every document with a learned merge table: per document,
    * whitespace words are BPE-encoded (merges in rank order through
    * [[applyMerge]]) and summarized as (doc_id, n_words, n_bpe_tokens,
    * bpe_hash = md5 of the space-joined token stream — `</w>` sentinels
    * make word boundaries unambiguous in the hash).
    *
    * Scale shape: merge table broadcast once; per-partition
    * word-to-tokens memo (Zipf makes the hit rate high); streaming
    * iterator map — no shuffle, no partition materialization. */
  def applyBpe(docs: DataFrame, textCol: String, merges: DataFrame): Dataset[BpeDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeList: Array[(String, String)] = merges.select("rank", "left", "right")
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    val bc = spark.sparkContext.broadcast(mergeList)
    docs.select(col("doc_id").cast("long"), coalesce(col(textCol), lit("")).as(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val words = text.split("\\s+").filter(_.nonEmpty)
          md.reset()
          var nTok = 0L
          var first = true
          words.foreach { w =>
            val toks = memo.getOrElseUpdate(w, {
              var syms = symbols(w)
              ms.foreach { case (l, r) =>
                // cheap containment probe before paying the rebuild
                var i = 0
                var hit = false
                while (!hit && i + 1 < syms.length) {
                  hit = syms(i) == l && syms(i + 1) == r; i += 1
                }
                if (hit) syms = applyMerge(syms, l, r)
              }
              syms
            })
            nTok += toks.length
            toks.foreach { t =>
              if (!first) md.update(' '.toByte)
              md.update(t.getBytes("UTF-8"))
              first = false
            }
          }
          BpeDoc(id, words.length.toLong, nTok,
            md.digest().map("%02x".format(_)).mkString)
        }
      }
  }
}
