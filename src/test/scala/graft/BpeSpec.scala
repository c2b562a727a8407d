package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE training determinism (hand-computed fixture), early stop, and
  * encode consistency with the trained merges. */
class BpeSpec extends AnyFunSuite with SparkSpecBase {

  private def docs(rows: (Int, String)*) =
    df("doc_id INT, text STRING", rows.map { case (i, t) => Row(Int.box(i), t) }: _*)

  private def merges(d: org.apache.spark.sql.DataFrame) =
    d.collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("trainBpe learns the hand-computed merge sequence with deterministic ties") {
    // corpus: aaab ×2, aab ×1
    //   pairs: (a,a)=5, (a,b)=3, (b,</w>)=3  → merge0 (a,a) @5
    //   then:  (aa,a)=2, (a,b)=2, (aa,b)=1, (b,</w>)=3 → merge1 (b,</w>) @3
    //   then:  (aa,a)=2, (a,b</w>)=2 tie → lexicographic: ("a","b</w>") wins
    val out = Bpe.trainBpe(docs((1, "aaab aaab"), (2, "aab")), "text", numMerges = 3)
    assert(merges(out) == Seq(
      (0, "a", "a", 5L), (1, "b", Bpe.EndWord, 3L), (2, "a", "b" + Bpe.EndWord, 2L)))
  }

  test("trainBpe stops early when no pair repeats; rerun is identical") {
    val d = docs((1, "ab cd"), (2, "ef"))
    val out = Bpe.trainBpe(d, "text", numMerges = 10)
    assert(out.count() == 0) // every pair count is 1
    val rich = docs((1, "xy xy xy"), (2, "zq"))
    val a = merges(Bpe.trainBpe(rich, "text", numMerges = 10))
    val b = merges(Bpe.trainBpe(rich, "text", numMerges = 10))
    assert(a == b && a.head == (0, "x", "y", 3L))
    // (x,y)@3 → (xy,</w>)@3 → nothing repeats → 2 merges, not 10
    assert(a.size == 2 && a(1) == (1, "xy", Bpe.EndWord, 3L))
  }

  test("maxVocabWords guard fails loudly instead of truncating") {
    val err = intercept[IllegalArgumentException](
      Bpe.trainBpe(docs((1, "a b c d e")), "text", 2, maxVocabWords = 3))
    assert(err.getMessage.contains("maxVocabWords"))
  }

  test("applyBpe encodes with trained merges; memoized words agree with fresh ones") {
    val train = docs((1, "aaab aaab"), (2, "aab"))
    val m = Bpe.trainBpe(train, "text", numMerges = 3)
    // aaab: [a a a b </w>] -(a,a)-> [aa a b </w>] -(b,</w>)-> [aa a b</w>]
    //       -(a,b</w>)-> [aa ab</w>]           = 2 tokens
    // aab:  [a a b </w>]  -> [aa b </w>] -> [aa b</w>] (no (a,b</w>) pair) = 2
    val rows = Bpe.applyBpe(docs((1, "aaab aab aaab"), (2, "")), "text", m)
      .collect().sortBy(_.doc_id)
    assert(rows(0).n_words == 3 && rows(0).n_bpe_tokens == 6)
    assert(rows(0).bpe_hash == md5Hex("aa ab</w> aa b</w> aa ab</w>"))
    assert(rows(1).n_words == 0 && rows(1).n_bpe_tokens == 0)
    assert(rows(1).bpe_hash == md5Hex(""))
  }

  test("applyBpe with an empty merge table yields character+sentinel tokens") {
    val m = Bpe.trainBpe(docs((1, "q w")), "text", 1) // nothing repeats → empty
    val out = Bpe.applyBpe(docs((1, "hi yo")), "text", m).collect().head
    // h i </w> y o </w>
    assert(out.n_bpe_tokens == 6)
    assert(out.bpe_hash == md5Hex("h i </w> y o </w>"))
  }
}
