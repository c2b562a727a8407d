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

  // ------------------------------------------------ independent reference
  // A from-scratch trainer/encoder written in deliberately DIFFERENT
  // style (immutable Lists, pair counting via groupMapReduce, selection
  // via sorted head) — shares no kernel with operators.Bpe, so agreement
  // on the REAL corpus gates q108/q135 independently of the production
  // code's own structure. This is the driver-side reference the q108
  // rows-only gate leans on.

  private def refTrain(words: Seq[(String, Long)], numMerges: Int): List[(String, String, Long)] = {
    def syms(w: String): List[String] =
      w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp))) ::: List(Bpe.EndWord)
    def mergeOne(xs: List[String], l: String, r: String): List[String] = xs match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeOne(rest, l, r)
      case a :: rest => a :: mergeOne(rest, l, r)
      case Nil => Nil
    }
    var vocab = words.map { case (w, c) => (syms(w), c) }.toList
    var out = List.empty[(String, String, Long)]
    var stop = false
    while (out.size < numMerges && !stop) {
      val counts = vocab
        .flatMap { case (s, c) => s.zip(s.drop(1)).map(p => (p, c)) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val best = counts.toList.sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= 2 =>
          out = out :+ (l, r, n)
          vocab = vocab.map { case (s, c) => (mergeOne(s, l, r), c) }
        case _ => stop = true
      }
    }
    out
  }

  test("trainBpe agrees with the independent reference on the real corpus") {
    val real = new java.io.File("/root/testdata/sf0.001/documents.parquet")
    assume(real.exists, "testdata not present")
    val d = spark.read.parquet(real.getPath)
    val got = merges(Bpe.trainBpe(d, "text", numMerges = 60))
      .map { case (_, l, r, c) => (l, r, c) }
    val wordCounts = d.selectExpr("explode(filter(split(coalesce(text, ''), '\\\\s+'), t -> t != '')) AS w")
      .groupBy("w").count().collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = refTrain(wordCounts, 60)
    assert(got == want, s"first divergence at rank ${got.zip(want).indexWhere(p => p._1 != p._2)}")
  }

  test("encodeWords is the per-word factorization of applyBpe (q109's oracle property)") {
    val real = new java.io.File("/root/testdata/sf0.001/documents.parquet")
    assume(real.exists, "testdata not present")
    val d = spark.read.parquet(real.getPath).limit(100)
    val m = Bpe.trainBpe(d, "text", numMerges = 40)
    val vocab = Bpe.encodeWords(d, "text", m).collect()
      .map(w => w.word -> ((w.n_tokens, w.toks))).toMap
    Bpe.applyBpe(d, "text", m).collect().foreach { doc =>
      val text = d.filter(s"doc_id = ${doc.doc_id}").select("text").head.getString(0)
      val words = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
      assert(doc.n_words == words.length)
      assert(doc.n_bpe_tokens == words.map(vocab(_)._1).sum)
      assert(doc.bpe_hash == md5Hex(words.map(vocab(_)._2).mkString(" ")))
    }
  }
}
