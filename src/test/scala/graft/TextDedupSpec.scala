package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.operators.{Corpus, Dedup, Similarity}

/** Text analysis, dedup family, and similarity kernels on fixed corpora. */
class TextDedupSpec extends AnyFunSuite with SparkSpecBase {

  private def docs(rows: (Int, String)*) =
    df("doc_id INT, text STRING", rows.map { case (i, t) => Row(Int.box(i), t) }: _*)

  test("token/char counts and ratios") {
    val out = docs((1, "The cat, the hat!"))
      .select(tokenCount(col("text")).as("n"), charCount(col("text")).as("c"),
        punctRatio(col("text")).as("p"), stopwordRatio(col("text"), Seq("the")).as("s"))
      .head
    assert(out.getLong(0) == 4 && out.getLong(1) == 17)
    assert(math.abs(out.getDouble(2) - 2.0 / 17) < 1e-12) // ',' and '!'
    assert(out.getDouble(3) == 0.25) // 'the' once lowercase of 4 tokens... 'The' != 'the'
  }

  test("langId picks the language with most stopword hits; 'und' when none") {
    val out = docs(
      (1, "the cat and the dog is in a house"),
      (2, "der hund und die katze ist nicht hier"),
      (3, "zzz qqq www"))
      .select(col("doc_id"), langId(col("text")).as("l")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "en", 2 -> "de", 3 -> "und"))
  }

  test("wordShingles: distinct n-grams; short text yields empty") {
    val out = docs((1, "a b c d"), (2, "a b"))
      .select(col("doc_id"), wordShingles(col("text"), 3).as("sh")).collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1).toSet).toMap
    assert(out(1) == Set("a b c", "b c d") && out(2) == Set.empty)
  }

  test("exact dedup groups normalized-identical docs, keeps min id") {
    val out = Dedup.exact(docs(
      (1, "Hello, World!"), (2, "hello world"), (3, "different")), "doc_id", "text")
    val groups = out.collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(groups == Set((1, 2L), (3, 1L)))
  }

  test("minhash LSH finds the near-duplicate pair and skips unrelated docs") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    val c = "completely unrelated text about spark window functions and shuffles here"
    val out = Dedup.minhashLshPairs(docs((1, a), (2, b), (3, c)), "doc_id", "text",
      shingleWords = 3, k = 8, bands = 4, threshold = 0.3)
    val pairs = out.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((1, 2)))
  }

  test("ngram Jaccard pairs only docs sharing a shingle; hot-shingle cap holds") {
    val out = Dedup.ngramJaccardPairs(docs(
      (1, "a b c d e"), (2, "a b c d x"), (3, "p q r s t")), "doc_id", "text",
      shingleWords = 3, threshold = 0.1)
    val pairs = out.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((1, 2)))
  }

  // boilerplate corpus for the skew caps: 'alpha beta gamma' opens all six
  // docs (shingle freq 6); docs 1-2 additionally share a genuine overlap;
  // docs 3-6 are pairwise unrelated beyond the boilerplate
  private def boilerplateDocs = docs(
    (1, "alpha beta gamma delta epsilon zeta eta"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),
    (3, "alpha beta gamma u3a u3b"),
    (4, "alpha beta gamma u4a u4b"),
    (5, "alpha beta gamma u5a u5b"),
    (6, "alpha beta gamma u6a u6b"))

  test("ngram Jaccard hot-shingle cap trips: boilerplate-only pairs vanish, " +
      "surviving pairs score the documented lower bound") {
    def run(cap: Int) = Dedup.ngramJaccardPairs(boilerplateDocs, "doc_id", "text",
        shingleWords = 3, threshold = 0.01, maxShingleFreq = cap)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // uncapped control: every pair shares at least the boilerplate shingle
    val open = run(1000)
    assert(open.keySet.size == 15, s"expected all 15 pairs, got ${open.keySet}")
    assert(math.abs(open((1, 2)) - 5.0 / 6) < 1e-12) // 5 shared of 5+6-5
    assert(math.abs(open((3, 4)) - 1.0 / 5) < 1e-12) // boilerplate only
    // cap 5 < freq 6: 'alpha beta gamma' is excluded from candidates AND
    // intersections; set sizes keep it → jaccard is a lower bound
    val capped = run(5)
    assert(capped.keySet == Set((1, 2)),
      s"only the genuine near-dup should survive the cap, got ${capped.keySet}")
    assert(math.abs(capped((1, 2)) - 4.0 / 7) < 1e-12) // 4 cold shared of 5+6-4
  }

  test("minhash LSH bucket cap trips: hot-bucket-only collisions vanish, " +
      "pairs colliding in a cold bucket keep exact jaccard") {
    // four IDENTICAL docs (3-6) share every band bucket → width-4 buckets
    val quad = docs(
      (1, "alpha beta gamma delta epsilon zeta eta"),
      (2, "alpha beta gamma delta epsilon zeta eta theta"),
      (3, "same boilerplate body repeated verbatim in four documents"),
      (4, "same boilerplate body repeated verbatim in four documents"),
      (5, "same boilerplate body repeated verbatim in four documents"),
      (6, "same boilerplate body repeated verbatim in four documents"))
    def run(cap: Int) = Dedup.minhashLshPairs(quad, "doc_id", "text",
        shingleWords = 3, k = 8, bands = 4, threshold = 0.01, maxBucketSize = cap)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val open = run(1000)
    assert(open.contains((3, 4)) && math.abs(open((3, 4)) - 1.0) < 1e-12)
    assert(open.contains((1, 2)), s"near-dup pair lost without cap: ${open.keySet}")
    // cap 3 < 4 identical docs: their buckets are dropped — recall loss on
    // exactly those pairs, precision elsewhere untouched
    val capped = run(3)
    assert(capped.keySet == Set((1, 2)),
      s"identical quad must vanish under the bucket cap, got ${capped.keySet}")
    assert(math.abs(capped((1, 2)) - 5.0 / 6) < 1e-12) // verify stays exact
  }

  test("connectedComponents: chains collapse to min id; disjoint clusters stay apart") {
    val pairs = df("id_a BIGINT, id_b BIGINT",
      Row(Long.box(2L), Long.box(1L)), // unordered pair input
      Row(Long.box(2L), Long.box(3L)),
      Row(Long.box(3L), Long.box(4L)), // chain 1-2-3-4 (diameter 3)
      Row(Long.box(7L), Long.box(9L)))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L)
    // driver union-find path (default limit) and distributed min-label
    // fallback (limit 0) must agree
    for (limit <- Seq(1000000L, 0L)) {
      val out = Dedup.connectedComponents(pairs, driverEdgeLimit = limit).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == expected, s"limit $limit: got $out")
    }
  }

  test("simhash: identical texts equal; near-identical texts within 3 bits") {
    def pop(x: Long) = java.lang.Long.bitCount(x)
    val sigs = docs(
      (1, "spark shuffles partition data across executors by key"),
      (2, "spark shuffles partition data across executors by key"),
      (3, "spark shuffles partition data across executors by hash"))
      .select(col("doc_id"), Dedup.simhash(col("text")).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sigs(1) == sigs(2))
    assert(pop(sigs(1) ^ sigs(3)) <= 6) // one token changed of 8
  }

  test("rolling fingerprint: equal for reordered-edge texts' shared grams; short-text fallback") {
    val out = docs((1, "abcdefgh"), (2, "abcdefgh"), (3, "abc"), (4, ""))
      .select(col("doc_id"), rollingFingerprint(normalizeText(col("text")), 5).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(1) == out(2)) // identical text → identical fingerprint
    // short text: whole text is the single gram → fp = hash32(text)
    val h3 = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    assert(out(3) == java.lang.Long.parseLong(h3, 16))
    assert(out.contains(4)) // empty text still fingerprints (hash of "")
  }

  test("bpeish token count: letter runs + digits + punctuation") {
    val out = docs((1, "Hello, world 42!"))
      .select(bpeishTokenCount(col("text")).as("n")).head.getLong(0)
    // hello | , | world | 4 | 2 | ! -> 6
    assert(out == 6)
  }

  test("cosine kernel and brute-force top-k ordering") {
    val vecs = df("vec_id INT, embedding ARRAY<DOUBLE>",
      Row(Int.box(0), Seq(1.0, 0.0)), Row(Int.box(1), Seq(1.0, 0.1)),
      Row(Int.box(2), Seq(0.0, 1.0)))
    val out = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
    val ranked = out.orderBy("rnk").collect().map(_.getInt(1)).toSeq
    assert(ranked == Seq(1, 2)) // nearest first
  }

  test("IVF top-k: probing all lists equals brute force; fewer probes is a subset") {
    val vecs = df("vec_id INT, embedding ARRAY<DOUBLE>",
      (0 until 12).map(i => Row(Int.box(i),
        Seq.tabulate(8)(j => math.cos(i * 8 + j) + 2.0))): _*)
    val brute = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", 4)
    // nprobe == nlist → every list probed → identical to brute force
    val full = Similarity.ivfTopK(
      vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", 4, nlist = 4, nprobe = 4)
    assert(canon(full) == canon(brute))
    // nprobe < nlist: results are a subset of scored pairs, still ranked 1..k
    val partial = Similarity.ivfTopK(
      vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", 4, nlist = 4, nprobe = 1)
    val perQuery = partial.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) <= 4))
  }

  test("IVF top-k: non-integer (string) ids work and agree with brute force at full probing") {
    val vecs = df("vec_id STRING, embedding ARRAY<DOUBLE>",
      (0 until 12).map(i => Row(f"doc_$i%02d",
        Seq.tabulate(8)(j => math.cos(i * 8 + j) + 2.0))): _*)
    val brute = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") < "doc_03"), vecs, "vec_id", "embedding", 4)
    val full = Similarity.ivfTopK(
      vecs.filter(col("vec_id") < "doc_03"), vecs, "vec_id", "embedding", 4, nlist = 4, nprobe = 4)
    assert(canon(full) == canon(brute))
  }

  test("IVFPQ: exhaustive codebooks + full probing reproduce exact L2 ranking") {
    val n = 12
    val vecs = df("vec_id INT, embedding ARRAY<DOUBLE>",
      (0 until n).map(i => Row(Int.box(i),
        Seq.tabulate(8)(j => math.cos(i * 8 + j) + 2.0))): _*)
    // ksub >= corpus size → every subvector is its own codeword → ADC is the
    // EXACT quantized squared L2; nprobe = nlist → nothing is missed
    val out = Similarity.ivfPqTopK(vecs.filter(col("vec_id") < 3), vecs,
      "vec_id", "embedding", 4, nlist = 2, nprobe = 2, m = 4, ksub = n)
    val q = Array.tabulate(n, 8)((i, j) => math.round(1e6 * (math.cos(i * 8 + j) + 2.0)).toDouble)
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + (a(i) - b(i)) * (a(i) - b(i)))
    val expected = (0 until 3).flatMap { qi =>
      (0 until n).filter(_ != qi).map(c => (qi, c, l2(q(qi), q(c))))
        .sortBy { case (_, c, d) => (d, c) }.take(4).zipWithIndex
        .map { case ((_, c, d), r) => (qi, c, d.toLong, r + 1) }
    }.toSet
    val got = out.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
    // determinism: seeds, codebooks, and tie-breaks are all content-derived
    val again = Similarity.ivfPqTopK(vecs.filter(col("vec_id") < 3), vecs,
      "vec_id", "embedding", 4, nlist = 2, nprobe = 2, m = 4, ksub = n)
    assert(canon(again) == canon(out))
  }

  test("randomProject coordinates equal driver-side Rademacher sign sums") {
    val vecs = df("vec_id INT, embedding ARRAY<DOUBLE>",
      (0 until 4).map(i => Row(Int.box(i), Seq.tabulate(8)(j => i + j * 0.5))): _*)
    val out = Similarity.randomProject(vecs, "vec_id", "embedding", outDims = 3, dims = 8)
    val signs = Similarity.planeSigns(3, 8)
    val got = out.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val exp = (0 until 4).map { i =>
      val q = Array.tabulate(8)(j => math.round(1e6 * (i + j * 0.5)).toDouble)
      i -> (0 until 3).map(p =>
        (0 until 8).foldLeft(0.0)((s, j) => s + q(j) * signs(p)(j)).toLong).toSeq
    }.toMap
    assert(got == exp)
  }

  test("LSH buckets are deterministic and self-similarity search finds exact match") {
    val vecs = df("vec_id INT, embedding ARRAY<DOUBLE>",
      (0 until 8).map(i => Row(Int.box(i),
        Seq.tabulate(16)(j => math.sin(i * 16 + j).abs))): _*)
    val out = Similarity.lshTopK(vecs, vecs, "vec_id", "embedding", 3, planes = 2, dims = 16)
    // every query that shares a bucket with anything gets ranked, rnk starts at 1
    assert(out.filter(col("rnk") === 1).count() > 0)
    val again = Similarity.lshTopK(vecs, vecs, "vec_id", "embedding", 3, planes = 2, dims = 16)
    assert(canon(out) == canon(again)) // deterministic hyperplanes
  }

  test("duplicateSpans: cross-doc shared window marks both sides, merges overlaps") {
    // A and B share exactly "a b c d e f g h" (8 tokens, k=8 → one window
    // each); C shares nothing
    val out = Corpus.duplicateSpans(docs(
      (1, "a b c d e f g h i j"),
      (2, "z z2 a b c d e f g h zz"),
      (3, "totally different words here with no overlap at all")), "doc_id", "text", k = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1, 10L, 8L, 1L), (2, 11L, 8L, 1L), (3, 9L, 0L, 0L)))
  }

  test("duplicateSpans: within-doc repetition found; separated repeats = two spans") {
    // "m" at index 8 separates two copies of the same 8-gram
    val rep = (1 to 8).map(i => s"x$i").mkString(" ")
    val out = Corpus.duplicateSpans(docs((1, s"$rep m $rep")), "doc_id", "text", k = 8)
      .head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == (17L, 16L, 2L))
  }

  test("duplicateSpans: overlapping duplicated windows merge into one maximal span") {
    // B repeats A's first NINE tokens → two overlapping duplicated 8-windows
    // (pos 0, 1) in each doc → one span of 9 covered tokens
    val nine = (1 to 9).map(i => s"w$i").mkString(" ")
    val out = Corpus.duplicateSpans(docs(
      (1, s"$nine tail1 tail2"), (2, s"$nine other3 other4")), "doc_id", "text", k = 8)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1, 9L, 1L), (2, 9L, 1L)))
  }

  test("removeDuplicateSpans keeps the corpus-first occurrence, strips the rest") {
    val out = Corpus.removeDuplicateSpans(docs(
      (1, "a b c d e f g h i j"),
      (2, "z z2 a b c d e f g h zz")), "doc_id", "text", k = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    // doc 1 wins the (doc_id, pos) argmin → untouched; doc 2 loses its copy
    assert(out == Set(
      (1, 10L, 0L, "a b c d e f g h i j"),
      (2, 11L, 8L, "z z2 zz")))
  }

  test("removeDuplicateSpans: within-doc repeat keeps the first copy") {
    val rep = (1 to 8).map(i => s"y$i").mkString(" ")
    val out = Corpus.removeDuplicateSpans(docs((1, s"$rep m $rep")), "doc_id", "text", k = 8)
      .head
    assert(out.getLong(2) == 8L && out.getString(3) == s"$rep m")
  }
}
