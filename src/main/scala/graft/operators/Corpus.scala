package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SqlFunctions.hash32
import graft.functions.TextFunctions.{shinglesOfTokens, tokenCount, tokens}

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
}
