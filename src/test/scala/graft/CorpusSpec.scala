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

  test("dedupSegments drops hot segments everywhere, reassembles in order, keeps emptied docs") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "a b c d"),        // ["a b", "c d"]
      Row(Long.box(2L), "a b x y"),        // ["a b", "x y"]
      Row(Long.box(3L), "a b p q"),        // ["a b", "p q"]
      Row(Long.box(4L), "a b"),            // ["a b"] → fully emptied
      Row(Long.box(5L), "z z a b k l"))    // gap closes: "z z k l"
    val out = Corpus.dedupSegments(docs, "doc_id", "text", windowTokens = 2, maxDocFreq = 2)
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(m(1L) == ((2L, 1L, md5Hex("c d"))), s"got ${m(1L)}")
    assert(m(2L) == ((2L, 1L, md5Hex("x y"))))
    assert(m(4L) == ((1L, 0L, md5Hex(""))), "emptied doc must still appear")
    assert(m(5L) == ((3L, 2L, md5Hex("z z k l"))), "surviving segments must keep order")
    out.unpersist(): Unit
  }

  test("qualityFilter: each rule fails independently and keep is their conjunction") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "the cat sat mat"),          // all rules pass
      Row(Long.box(2L), "a b"),                      // too short → r_len
      Row(Long.box(3L), "the aaaaaa bbbbbb cccccc"), // awl 5.25 > 4 → r_awl
      Row(Long.box(4L), "cat sat mat dog"),          // no stopwords → r_stop
      Row(Long.box(5L), "the the the the"))          // dup 2-grams → r_rep
    val out = Corpus.qualityFilter(docs, "doc_id", "text",
      minTokens = 3, maxTokens = 5, minAwl = 2.0, maxAwl = 4.0,
      minStopRatio = 0.2, maxDupPermille = 300, stopwords = Seq("the"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    assert(out(1L) == ((1, 1, 1, 1, 1)), s"got ${out(1L)}")
    assert(out(2L)._1 == 0 && out(2L)._5 == 0)
    assert(out(3L) == ((1, 0, 1, 1, 0)))
    assert(out(4L) == ((1, 1, 0, 1, 0)))
    assert(out(5L) == ((1, 1, 1, 0, 0)))
  }

  test("sampleStratified: rate 1 keeps all, rate 0 keeps none, membership is content-stable") {
    def docs(n: Int) = df("doc_id BIGINT, lang STRING",
      (1 to n).map(i => Row(Long.box(i), if (i % 2 == 0) "a" else "b")): _*)
    val all = Corpus.sampleStratified(docs(100), "doc_id", "lang",
      rates = Seq("a" -> 1.0, "b" -> 0.0)).collect()
    assert(all.length == 50 && all.forall(_.getString(1) == "a"))
    def kept(n: Int) = Corpus.sampleStratified(docs(n), "doc_id", "lang",
      rates = Seq("a" -> 0.5, "b" -> 0.5)).collect().map(_.getLong(0)).toSet
    val small = kept(50)
    val grown = kept(200)
    assert(small.subsetOf(grown), "a grown corpus must keep every sampled doc")
  }

  test("distinctSketch: linear-counting estimate tracks true cardinality; saturation yields NULL") {
    import graft.operators.Ops
    // 2000 distinct values over m=4096 buckets → estimate within a few %
    val docs = df("g STRING, v BIGINT",
      (1 to 2000).map(i => Row("a", Long.box(i % 1500))) ++
        (1 to 10).map(i => Row("b", Long.box(i))): _*)
    val out = Ops.distinctSketch(docs, Seq("g"), col("v"), m = 4096)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a")._1 == 2000 && out("b")._1 == 10)
    assert(math.abs(out("a")._3 - 1500) / 1500.0 < 0.05,
      s"estimate ${out("a")._3} off true 1500 by > 5%")
    assert(math.abs(out("b")._3 - 10) < 2.0)
    // m=4 with 100 distinct values saturates every bucket → NULL estimate
    val sat = Ops.distinctSketch(docs.filter(col("g") === "a"), Seq("g"), col("v"), m = 4)
      .head
    assert(sat.isNullAt(3), "saturated sketch must yield NULL, not infinity")
  }

  test("crossEntropyScore: hand-computed unigram cross-entropy") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "a a b"),
      Row(Long.box(2L), "b c"))
    // counts: a=2 b=2 c=1, total 5 → p(a)=p(b)=0.4, p(c)=0.2
    val out = Corpus.crossEntropyScore(docs, "doc_id", "text")
    val m = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) == ((3L, 0.916291)), s"got ${m(1L)}")   // -ln(0.4)
    assert(m(2L) == ((2L, 1.262864)), s"got ${m(2L)}")   // -(ln.4+ln.2)/2
    out.unpersist(): Unit
  }

  test("importanceWeights matches a driver-side reference under forced bucket collisions") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 12).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" "),
        i % 3 == 0)
    }
    val docs = df("doc_id BIGINT, text STRING, tgt BOOLEAN",
      corpus.map { case (i, t, g) => Row(Long.box(i), t, Boolean.box(g)) }: _*)
    // B=16 with up to 36 distinct bigrams forces collisions — the reference
    // must agree through them, not around them
    val out = Corpus.importanceWeights(docs, "doc_id", "text", col("tgt"), n = 2, buckets = 16)
    val got = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out.unpersist()
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(s: String): Long = {
      val h = md.digest(s.getBytes("UTF-8")); md.reset()
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 16
    }
    val gramsOf = corpus.map { case (id, t, g) =>
      (id, t.split("\\s+").toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq, g)
    }
    val all = gramsOf.flatMap { case (_, gs, g) => gs.map(x => (bucket(x), g)) }
    val (nr, nt) = (all.size.toLong, all.count(_._2).toLong)
    val cr = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def lnq(c: Long, tot: Long): JBD =
      new JBD(math.log((c + 1).toDouble / (tot + 16).toDouble).toString)
        .setScale(12, RoundingMode.HALF_UP)
    val expected = gramsOf.filter(_._2.nonEmpty).map { case (id, gs, _) =>
      val s = gs.map { x =>
        val b = bucket(x)
        lnq(ct.getOrElse(b, 0L), nt).subtract(lnq(cr(b), nr))
      }.reduce(_.add(_))
      id -> ((gs.size.toLong,
        new JBD(s.doubleValue.toString).setScale(6, RoundingMode.HALF_UP).doubleValue))
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("refine: every disposition fires, priority order and the dedup cohort rule hold") {
    // passing text: 30 tokens, awl in range, one stopword, no repetition
    def passing(tag: String) =
      ("the" +: (1 to 29).map(i => s"${tag}word$i")).mkString(" ")
    val t1 = passing("a")
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(0L), passing("p")),      // probe doc: passes quality → contaminated
      Row(Long.box(9L), t1.toUpperCase),    // same fingerprint as 10 but fails
                                            // r_stop ('THE' is not a stopword)
      Row(Long.box(10L), t1),               // quality-passing fingerprint winner
      Row(Long.box(11L), t1),               // exact duplicate of 10
      Row(Long.box(20L), passing("z")))     // unique survivor
    val out = Corpus.refine(docs, "doc_id", "text",
      docs.filter(col("doc_id") < 5), "text")
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
    out.unpersist()
    // cohort rule: 9 shares 10's fingerprint but failed quality, so the
    // winner among PASSERS is 10 — were dedup run over all docs, 9 (lower
    // id) would win and 10 would wrongly read exact_dup
    assert(rows(9L)._1 == "quality" && rows(10L)._1 == "kept", s"got $rows")
    assert(rows(11L)._1 == "exact_dup" && rows(0L)._1 == "contaminated")
    assert(rows(20L)._1 == "kept")
    // split only for kept, and exactly the seeded hash assignment
    assert(rows.values.collect { case (s, sp) if s != "kept" => sp }.forall(_.isEmpty))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucketOf(id: Long): Long = {
      val h = md.digest(s"graft:$id".getBytes("UTF-8")); md.reset()
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    def splitOf(id: Long) = bucketOf(id) match {
      case b if b < 80 => "train"; case b if b < 90 => "validation"; case _ => "test"
    }
    assert(rows(10L)._2.contains(splitOf(10L)) && rows(20L)._2.contains(splitOf(20L)))
  }

  test("quantileBuckets: integer-space CDF buckets, ties share one, nulls drop") {
    val d = df("id INT, s DOUBLE",
      Row(Int.box(1), Double.box(1.0)), Row(Int.box(2), Double.box(1.0)),
      Row(Int.box(3), Double.box(2.0)), Row(Int.box(4), Double.box(3.0)),
      Row(Int.box(5), null))
    val out = Corpus.quantileBuckets(d, "s", q = 2)
    val m = out.collect().map(r => r.getAs[Int]("id") -> r.getAs[Int]("bucket")).toMap
    // n=4; cum(1.0)=2 → (2·2+3) div 4 = 1; cum(2.0)=3 → 2; cum(3.0)=4 → 2
    assert(m == Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 2), s"got $m")
    // q = n: every distinct rank its own bucket, still 1-based and ≤ q
    val fine = Corpus.quantileBuckets(d, "s", q = 4)
    val f = fine.collect().map(r => r.getAs[Int]("id") -> r.getAs[Int]("bucket")).toMap
    assert(f == Map(1 -> 2, 2 -> 2, 3 -> 3, 4 -> 4), s"got $f")
  }

  test("chunkTokens: overlap, short tail, full coverage") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "t1 t2 t3 t4 t5"),  // size 3 stride 2 → [t1..t3], [t3..t5]
      Row(Long.box(2L), "s1 s2"),           // shorter than size → one chunk
      Row(Long.box(3L), ""))                // empty → no chunks
    val out = Corpus.chunkTokens(docs, "doc_id", "text", size = 3, stride = 2)
    val m = out.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(m.keySet == Set((1L, 0), (1L, 1), (2L, 0)), s"got ${m.keySet}")
    assert(m((1L, 0)) == ((3L, md5Hex("t1 t2 t3"))))
    assert(m((1L, 1)) == ((3L, md5Hex("t3 t4 t5"))), "second chunk must overlap by size-stride")
    assert(m((2L, 0)) == ((2L, md5Hex("s1 s2"))))
    out.unpersist(): Unit
  }

  test("stratumQuota caps each stratum deterministically") {
    val docs = df("doc_id BIGINT, source STRING",
      ((1 to 5).map(i => Row(Long.box(i), "a")) :+ Row(Long.box(9L), "b")): _*)
    def kept() = Corpus.stratumQuota(docs, "doc_id", "source", maxPerStratum = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val k1 = kept()
    assert(k1.count(_._2 == "a") == 3 && k1.count(_._2 == "b") == 1, s"got $k1")
    assert(k1.forall(_._3 <= 3))
    assert(kept() == k1, "survivor set must be deterministic")
  }

  test("heavyHittersCms: estimate >= exact always, exact when width avoids collisions") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "a a a a b b b c c d"),
      Row(Long.box(2L), "a b c d e"))
    // wide grid: no collisions plausible at 5 tokens → est == exact
    val wide = Corpus.heavyHittersCms(docs, "text", depth = 4, width = 1024, k = 10,
      minSupport = 2L)
    val m = wide.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    wide.unpersist()
    assert(m("a") == ((5L, 5L, 1)) && m("b") == ((4L, 4L, 2)) && m("c") == ((3L, 3L, 3)))
    assert(m("d") == ((2L, 2L, 4)) && !m.contains("e")) // minSupport prunes singletons
    // 1-bucket grid: every cell counts ALL tokens → est = N for everything,
    // the one-sided error at its extreme; exact counts are unaffected
    val tiny = Corpus.heavyHittersCms(docs, "text", depth = 2, width = 1, k = 10,
      minSupport = 1L)
    val t = tiny.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    tiny.unpersist()
    assert(t.values.forall { case (exact, est) => est == 15L && est >= exact })
    assert(t("e") == ((1L, 15L)))
  }

  test("cdcChunks: boundary after trigger tokens; chunk identity survives a prefix edit") {
    // find tokens on either side of the cut rule hash32(tok) % 4 == 0
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val h = md.digest(s.getBytes("UTF-8")); md.reset()
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
    }
    val words = (0 until 200).map(i => s"w$i")
    val trig = words.filter(h32(_) % 4 == 0)
    val plain = words.filterNot(h32(_) % 4 == 0)
    val Seq(t1, t2) = trig.take(2); val Seq(a, b, c, d, e) = plain.take(5).toSeq
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), s"$a $b $t1 $c $d $t2 $e"), // chunks: [a b t1][c d t2][e]
      Row(Long.box(2L), s"$e $t1 $c $d $t2 $e"),    // edited prefix, same suffix
      Row(Long.box(3L), s"$a $t1"),                 // trailing trigger: no tail chunk
      Row(Long.box(4L), ""))                        // empty doc: no rows
    val out = Corpus.cdcChunks(docs, "doc_id", "text", mod = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    out.unpersist()
    assert(rows.keys.count(_._1 == 1L) == 3 && rows.keys.count(_._1 == 2L) == 3)
    assert(rows((1L, 0L))._1 == 3 && rows((1L, 2L))._1 == 1)
    // content-local cuts: the chunks after the edit point are IDENTICAL —
    // the stability fixed windows cannot give
    assert(rows((1L, 1L)) == rows((2L, 1L)) && rows((1L, 2L)) == rows((2L, 2L)))
    assert(rows((1L, 0L)) != rows((2L, 0L)))
    assert(rows.keys.count(_._1 == 3L) == 1 && rows((3L, 0L))._1 == 2)
    assert(!rows.keys.exists(_._1 == 4L))
  }

  test("ngramLm: hand-computed bigram counts, conditional probs, rank tiebreak") {
    val docs = df("doc_id INT, text STRING",
      Row(Int.box(1), "a b a b a c"),
      Row(Int.box(2), "x")) // below n tokens: contributes nothing
    val out = Corpus.ngramLm(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))).toMap
    // bigrams: (a,b)x2 (b,a)x2 (a,c)x1 — prefix totals a=3, b=2
    assert(out == Map(
      ("a", "b") -> ((2L, 3L, 0.666667, 1)),
      ("a", "c") -> ((1L, 3L, 0.333333, 2)),
      ("b", "a") -> ((2L, 2L, 1.0, 1))), s"got $out")
  }

  test("ngramLm: k truncates per prefix; minPrefixTotal prunes rare prefixes") {
    val docs = df("doc_id INT, text STRING",
      Row(Int.box(1), "p a p b p c p a p b p a")) // p→{a:3,b:2,c:1}, a→p:2, b→p:2, c→p:1
    val top = Corpus.ngramLm(docs, "text", n = 2, k = 2, minPrefixTotal = 6L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(5)))
    // only prefix p survives the total cutoff (6 occurrences), and k=2
    // keeps a (rnk 1) and b (rnk 2) — c truncated
    assert(top.toSet == Set(("p", "a", 1), ("p", "b", 2)), s"got ${top.toSeq}")
  }

  test("dedupIncremental: cross-batch dups drop via state, min-id wins in-batch, rerun converges") {
    val root = java.nio.file.Files.createTempDirectory("graft_dedup_spec").toString + "/state"
    val b1 = df("doc_id BIGINT, text STRING",
      Row(Long.box(5L), "same content"), Row(Long.box(3L), "same content"),
      Row(Long.box(7L), "unique one"))
    val b2 = df("doc_id BIGINT, text STRING",
      Row(Long.box(10L), "same content"), // dup of batch 1 → dropped by state
      Row(Long.box(11L), "brand new"),
      Row(Long.box(12L), null)) // NULL text: fp of "" — must dedup, not NULL-leak
    val kept1 = Corpus.dedupIncremental(spark, root, b1, "doc_id", "text")
      .collect().map(r => r.getLong(1)).toSet
    assert(kept1 == Set(3L, 7L), s"got $kept1") // min id wins within the batch
    val kept2 = Corpus.dedupIncremental(spark, root, b2, "doc_id", "text")
      .collect().map(r => r.getLong(1)).toSet
    assert(kept2 == Set(11L, 12L), s"got $kept2")
    // replaying batch 2 is a no-op: its fingerprints are all in the state
    // now — including the null-text doc's (a NULL fp would anti-join
    // NULL-vs-NULL and leak the dup back out on every replay)
    val replay = Corpus.dedupIncremental(spark, root, b2, "doc_id", "text").count()
    assert(replay == 0L)
    // a later batch's null-text doc is a dup of the registered "" content
    val b3 = df("doc_id BIGINT, text STRING", Row(Long.box(20L), null))
    assert(Corpus.dedupIncremental(spark, root, b3, "doc_id", "text").count() == 0L)
    // the state table accumulated every kept fingerprint exactly once
    assert(spark.read.parquet(root).count() == 4L)
    // maintenance loop: append-mode batches fragment the state; compaction
    // repacks it without changing the dedup contract (replay still no-op)
    val (nb, na) = graft.core.TableIO.compact(spark, root)
    assert(nb >= 2 && na == 1, s"compact $nb -> $na files")
    assert(spark.read.parquet(root).count() == 4L)
    assert(Corpus.dedupIncremental(spark, root, b2, "doc_id", "text").count() == 0L)
  }

  test("dedupIncrementalBucketed: same keep semantics; state scans bucketed with no state-side exchange") {
    val tbl = "graft_dedup_bucketed_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val b1 = df("doc_id BIGINT, text STRING",
      Row(Long.box(5L), "same content"), Row(Long.box(3L), "same content"),
      Row(Long.box(7L), "unique one"))
    val b2 = df("doc_id BIGINT, text STRING",
      Row(Long.box(10L), "same content"), Row(Long.box(11L), "brand new"),
      Row(Long.box(12L), null))
    val kept1 = Corpus.dedupIncrementalBucketed(spark, tbl, b1, "doc_id", "text", numBuckets = 4)
      .collect().map(_.getLong(1)).toSet
    assert(kept1 == Set(3L, 7L), s"got $kept1")
    val kept2 = Corpus.dedupIncrementalBucketed(spark, tbl, b2, "doc_id", "text", numBuckets = 4)
      .collect().map(_.getLong(1)).toSet
    assert(kept2 == Set(11L, 12L), s"got $kept2")
    // replay converges; the appended files keep the bucket spec
    assert(Corpus.dedupIncrementalBucketed(spark, tbl, b2, "doc_id", "text", numBuckets = 4).count() == 0L)
    assert(spark.table(tbl).count() == 4L)
    // the 100 TB claim: with broadcast off (state too big to ship), the
    // anti-join must read the state CO-LOCATED — bucketed scan, and the
    // ONLY exchange in the plan is the batch side shuffling to the bucket
    // count; the fingerprint history never re-shuffles
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = df("fp STRING, keep_id BIGINT", Row("aa", Long.box(1L)))
      val plan = batch.join(spark.table(tbl), Seq("fp"), "left_anti")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan.take(3000))
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    spark.sql(s"DROP TABLE IF EXISTS $tbl"): Unit
  }


  test("compressionRatio: repetition compresses, noise doesn't; UTF-8 bytes; NULL on empty") {
    val rnd = new scala.util.Random(7)
    val noise = rnd.alphanumeric.take(1000).mkString
    val rows = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "ab" * 500),          // pure repetition
      Row(Long.box(2L), noise),               // high-entropy
      Row(Long.box(3L), ""),                  // empty
      Row(Long.box(4L), null),                // NULL text = empty by contract
      Row(Long.box(5L), "caf\u00e9"))          // multibyte UTF-8
    val got = Corpus.compressionRatio(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val (rep, noi) = (got(1L).getDouble(3), got(2L).getDouble(3))
    assert(rep < 0.05, s"repetition should compress hard, ratio=$rep")
    assert(noi > 0.5, s"noise should barely compress, ratio=$noi")
    assert(got(3L).isNullAt(3) && got(3L).getLong(1) == 0L)
    assert(got(4L).isNullAt(3))
    assert(got(5L).getLong(1) == 5L, "caf\u00e9 is 5 UTF-8 bytes")
    // determinism: a second run is byte-identical
    val again = Corpus.compressionRatio(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), Option(r.get(3)))).toMap
    got.foreach { case (id, r) =>
      assert(again(id) == ((r.getLong(2), Option(r.get(3)))), s"doc $id not deterministic")
    }
  }

  test("ngramCompressibility: LZ77-style proxy separates repetition from noise; exact counts") {
    val rnd = new scala.util.Random(11)
    val noise = rnd.alphanumeric.take(1000).mkString
    val rows = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "abc" * 100),      // cycle of 3: exactly 3 distinct 8-grams
      Row(Long.box(2L), noise),            // high-entropy: nearly all distinct
      Row(Long.box(3L), "short"),          // under one gram
      Row(Long.box(4L), ""),               // empty
      Row(Long.box(5L), null),             // NULL text = empty by contract
      Row(Long.box(6L), "x" * 9000))       // prefix cap: counts stop at 4096 chars
    val got = Corpus.ngramCompressibility(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((293L, 3L)), got(1L).toString)   // 300-8+1 grams, 3 distinct
    assert(got(2L)._1 == 993L && got(2L)._2 > 900L, got(2L).toString)
    assert(got(3L) == ((0L, 0L)))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((0L, 0L)))
    assert(got(6L) == ((4089L, 1L)), got(6L).toString)  // 4096-char prefix, one gram
    // the separation the proxy exists for: distinct/total low for
    // boilerplate, near 1 for prose-like entropy
    assert(got(1L)._2.toDouble / got(1L)._1 < 0.05)
    assert(got(2L)._2.toDouble / got(2L)._1 > 0.9)
  }

  test("cleanMarkup: tags stripped, one decode layer, &amp; last, counts pre-decode") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "<p>a &amp;lt; b</p>  <br/>x &quot;y&#39;s&quot;&nbsp;z"),
      Row(Long.box(2L), null))
    val out = Corpus.cleanMarkup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // &amp;lt; decodes ONE layer to the literal text "&lt;" (never to "<");
    // entity count sees &amp;, &quot;×2, &#39;, &nbsp; = 5 (the lt; tail of
    // the double-encoded entity is not an entity token pre-decode)
    assert(out(1L) == (("a &lt; b x \"y's\" z", 3, 5)), s"got ${out(1L)}")
    assert(out(2L) == (("", 0, 0)))
  }

  test("tfidfTopK: hand-computed smoothed scores, term tie-break") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "x x y"),
      Row(Long.box(2L), "y z"))
    val out = Corpus.tfidfTopK(docs, "doc_id", "text", k = 3)
    val m = out.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getDouble(4), r.getInt(5)))).toMap
    // N=2; df: x=1 y=2 z=1; idf_x = idf_z = ln(3/2)+1, idf_y = ln(1)+1 = 1
    assert(m((1L, "x")) == ((2.81093, 1)), s"got ${m((1L, "x"))}")
    assert(m((1L, "y")) == ((1.0, 2)))
    assert(m((2L, "z")) == ((1.405465, 1)))
    assert(m((2L, "y")) == ((1.0, 2)))
    out.unpersist(): Unit
  }

  test("bm25TopK: tf raises, length normalization lowers, non-matches drop") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), "a a b"),   // tf(a)=2
      Row(Long.box(2L), "a b"),     // tf(a)=1, short
      Row(Long.box(3L), "a b b b b b"), // tf(a)=1, long — length-penalized
      Row(Long.box(4L), "c c c"))   // no query term — absent from result
    val out = Corpus.bm25TopK(docs, "doc_id", "text", Seq("a"), k = 10)
    val rows = out.collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), s"got $rows")
    assert(rows(1L) == 1, "highest tf ranks first")
    assert(rows(2L) == 2 && rows(3L) == 3, "same tf: shorter doc outranks longer")
    out.unpersist(): Unit
  }

  test("bm25TopK: k caps the result, score ties break on doc id") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(Long.box(10L), "a b"), Row(Long.box(7L), "a b"), Row(Long.box(9L), "a b"))
    val out = Corpus.bm25TopK(docs, "doc_id", "text", Seq("a"), k = 2)
    val got = out.collect().sortBy(_.getInt(4)).map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 9L), s"got $got")
    out.unpersist(): Unit
  }
}
