package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Corpus-management operators: reproducible splits, token packing. */
class CorpusSpec extends AnyFunSuite with SparkSpecBase {

  test("splitAssign is content-stable: a doc's split ignores the rest of the corpus") {
    def ids(n: Int) = df("doc_id BIGINT", (1 to n).map(i => Row(Long.box(i))): _*)
    def splits(n: Int) = Corpus.splitAssign(ids(n), "doc_id", "s1").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val small = splits(50)
    val grown = splits(200)
    small.foreach { case (id, sp) =>
      assert(grown(id) == sp, s"doc $id reassigned when the corpus grew")
    }
    // roughly 80/10/10 over a larger draw
    val counts = splits(2000).values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1400 && counts("test") > 100, s"skewed: $counts")
  }

  test("splitAssign varies with seed") {
    val ids = df("doc_id BIGINT", (1 to 200).map(i => Row(Long.box(i))): _*)
    def m(seed: String) = Corpus.splitAssign(ids, "doc_id", seed).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m("a") != m("b"), "independent seeds produced identical assignments")
  }

  test("decontaminate flags probe overlap only; n_hits counts distinct shared n-grams") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "the quick brown fox jumps over the lazy dog"),
      Row(Long.box(2L), "a quick brown fox jumps over the lazy cat today"), // shares 8-grams? no — differs at both ends
      Row(Long.box(3L), "completely unrelated content with no overlap at all here"),
      Row(Long.box(4L), "xx the quick brown fox jumps over the lazy dog yy")) // contains doc 1's full 9 tokens
    val probes = docs.filter(col("doc_id") === 1)
    val out = Corpus.decontaminate(docs, "doc_id", "text", probes, "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: its own two 8-grams; doc 4: contains both of doc 1's 8-grams
    assert(out == Map(1L -> 2L, 4L -> 2L), s"got $out")
  }

  test("repetitionRatio: 0 below n tokens, rises with repeated n-grams") {
    import graft.functions.TextFunctions._
    val out = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "a b"),                    // < 3 tokens → 0.0
      Row(Long.box(2L), "a b c d e"),              // all distinct → 0.0
      Row(Long.box(3L), "a b c a b c a b c"))      // looped boilerplate
      .select(col("doc_id"), repetitionRatio(tokens(col("text")), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0)
    // 7 grams, 3 distinct → 1 - 3/7 ≈ 0.571429
    assert(math.abs(out(3L) - 0.571429) < 1e-6, s"got ${out(3L)}")
  }

  test("tokenStats: percentile_disc over the length histogram") {
    // 10 docs with 1..10 tokens: p50 = 5th value = 5, p95 = 10, p99 = 10
    val docs = df("doc_id BIGINT, text STRING",
      (1 to 10).map(i => Row(Long.box(i), (1 to i).map(j => s"w$j").mkString(" "))): _*)
    val r = Corpus.tokenStats(docs, "text").head
    assert(r.getLong(r.fieldIndex("n_docs")) == 10)
    assert(r.getLong(r.fieldIndex("total_tokens")) == 55)
    assert(r.getLong(r.fieldIndex("p50")) == 5 && r.getLong(r.fieldIndex("p95")) == 10)
  }

  test("packByTokenBudget: contiguous bins, straddler stays in its starting bin") {
    // one shard (shards=1) so the packing order is just doc_id
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "a b c"),       // 3 tokens, cum 3  → bin 0
      Row(Long.box(2L), "d e f g"),     // 4 tokens, cum 7  → starts at 3 → bin 0
      Row(Long.box(3L), "h i"),         // 2 tokens, cum 9  → starts at 7 → bin 0 (straddles)
      Row(Long.box(4L), "j k l"))       // 3 tokens, cum 12 → starts at 9 → bin 1
    val out = Corpus.packByTokenBudget(docs, "doc_id", "text", budget = 8, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L), s"got $out")
  }
}
