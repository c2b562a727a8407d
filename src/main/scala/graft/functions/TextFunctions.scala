package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  * Not present in the reference (a pure warehouse) — added per the engine's
  * LLM-data-pipeline mandate (BASELINE.json north star).
  *
  * Everything here is built-in higher-order functions over arrays (transform /
  * filter / aggregate) — codegen-friendly, no UDFs, so the hot path stays in
  * WholeStageCodegen and distributes trivially (pure per-row map, no shuffle).
  */
object TextFunctions {

  /** The engine's shared English stopword profile (mirrored literally in
    * every oracle's `$EnStop` list — change both together). */
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Lowercase, strip non-alphanumerics to spaces, collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]+", " "), "\\s+", " "))

  /** Whitespace tokens with empties removed. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  def charCount(c: Column): Column = length(c).cast("long")

  /** Mean token length (0.0 for empty text). */
  def avgWordLen(c: Column): Column = {
    val ts = tokens(c)
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Fraction of characters that are neither alphanumeric nor whitespace. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      length(regexp_replace(c, "[a-zA-Z0-9\\s]", "")).cast("double") / length(c))

  /** Fraction of tokens appearing in `stopwords`. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val ts = tokens(c)
    val sw = array(stopwords.map(lit): _*)
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => array_contains(sw, t))).cast("double") / size(ts))
  }

  /** Stopword tables for the n-gram/stopword language-ID heuristic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que"))

  /** Per-language stopword hit count. */
  def langScore(c: Column, lang: String): Column = {
    val sw = array(LangStopwords.toMap.apply(lang).map(lit): _*)
    size(filter(tokens(c), t => array_contains(sw, t))).cast("long")
  }

  /** Heuristic language ID: argmax of stopword hits, fixed precedence
    * en > de > fr > es on ties; 'und' (undetermined) when all scores are 0. */
  def langId(c: Column): Column = {
    val scores = LangStopwords.map { case (l, _) => l -> langScore(c, l) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), el) =>
      when(best > 0 && s === best, lit(l)).otherwise(el)
    }
  }

  /** Composite quality score in [0,1]: length band + stopword presence +
    * mean-word-length band. Deterministic arithmetic, documented weights. */
  def qualityScore(c: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(c)
    val lenScore = when(nTok >= 20 && nTok <= 2000, lit(0.4))
      .when(nTok >= 5, lit(0.2)).otherwise(lit(0.0))
    val swScore = when(stopwordRatio(c, stopwords) >= 0.01, lit(0.3)).otherwise(lit(0.0))
    val awl = avgWordLen(c)
    val wlScore = when(awl >= 2.5 && awl <= 10.0, lit(0.3)).otherwise(lit(0.0))
    round(lenScore + swScore + wlScore, 2)
  }

  /** Document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalizeText(c).cast("binary"))

  /** Shingles from an already-materialized token-array column. `ts` MUST be a
    * plain attribute (the output of a prior projection of `tokens(text)`):
    * Catalyst inlines expression arguments into every `element_at` reference
    * inside the lambda, so passing `tokens(text)` directly re-runs the regex
    * split O(positions × n) times per row — measured 26 s vs 0.3 s on 5k docs. */
  def shinglesOfTokens(ts: Column, n: Int): Column =
    array_distinct(
      when(size(ts) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(0), size(ts) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(ts, i + j + 1)): _*))))

  /** Word n-gram shingles (distinct), the unit for MinHash/Jaccard dedup.
    * Convenience/slow path — operator code should project `tokens` first and
    * use [[shinglesOfTokens]] (see that scaladoc for why). */
  def wordShingles(c: Column, n: Int): Column = shinglesOfTokens(tokens(c), n)

  /** Character n-gram shingles from an already-materialized normalized-text
    * column (same attribute-binding rule as [[shinglesOfTokens]]). Texts
    * shorter than `n` yield the whole text as their single shingle. */
  def charShinglesOfNorm(norm: Column, n: Int): Column =
    array_distinct(
      when(length(norm) < n, array(norm)).otherwise(
        transform(sequence(lit(1), length(norm) - n + 1), i => norm.substr(i, lit(n)))))

  /** Character n-gram shingles (distinct) over normalized text.
    * Convenience/slow path — project [[normalizeText]] first in hot code. */
  def charShingles(c: Column, n: Int): Column = charShinglesOfNorm(normalizeText(c), n)

  /** Raw (NON-distinct) word n-grams — the denominator for repetition
    * scoring. Same attribute-binding rule as [[shinglesOfTokens]]. */
  def rawShinglesOfTokens(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(ts) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(ts, i + j + 1)): _*)))

  /** Within-document repetition ratio (Gopher-style quality signal):
    * 1 − distinct n-grams / total n-grams — 0.0 for texts with fewer than
    * `n` tokens, approaching 1.0 for looped boilerplate. Pure per-row map. */
  def repetitionRatio(ts: Column, n: Int): Column = {
    val raw = rawShinglesOfTokens(ts, n)
    when(size(raw) === 0, lit(0.0)).otherwise(
      round(lit(1.0) - size(array_distinct(raw)).cast("double") / size(raw), 6))
  }

  /** Rolling-hash document fingerprint (winnowing-style): the minimum 32-bit
    * hash over character n-grams of the normalized text — robust to token
    * reordering at the edges, cheap to compare, pure per-row map. */
  def rollingFingerprint(norm: Column, n: Int = 5): Column =
    array_min(transform(charShinglesOfNorm(norm, n), g => SqlFunctions.hash32(g)))

  /** BPE-ish subword count estimator: alphabetic runs count 1 each, digits
    * count 1 each, any other non-space character counts 1 — a deterministic
    * regex proxy for tokenizer load (true BPE needs a vocab file). */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).cast("long")
}
