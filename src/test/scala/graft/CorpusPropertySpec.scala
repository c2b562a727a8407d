package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cluster, Corpus, Ops}

/** Property gates for the corpus/clustering operators: each Spark result is
  * replayed against a direct Scala reference implementation over random
  * inputs (ScalaCheck generators, fixed seeds for reproducibility) — the
  * oracle queries pin one fixture; these pin the semantics on corpora the
  * fixture never exercises (tiny vocab → heavy segment collisions, ragged
  * lengths, empty docs). */
class CorpusPropertySpec extends AnyFunSuite with SparkSpecBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // small vocab forces shared segments; some empty docs
  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 30)
    docs <- Gen.listOfN(n, for {
      len <- Gen.frequency(1 -> Gen.const(0), 9 -> Gen.choose(1, 20))
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield ws.mkString(" "))
  } yield docs

  private def toDf(docs: List[String]) =
    df("doc_id BIGINT, text STRING",
      docs.zipWithIndex.map { case (t, i) => Row(Long.box(i.toLong), t) }: _*)

  private def toks(s: String): Vector[String] =
    s.split("\\s+").filter(_.nonEmpty).toVector

  test("rollingWindow matches an O(n²) reference over random event streams") {
    import org.apache.spark.sql.functions.col
    val evGen: Gen[List[(Int, Long, Double)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1, 4)
        t <- Gen.choose(0L, 500L) // seconds; dense → heavy frame overlap + ties
        v <- Gen.choose(-50, 50)
      } yield (u, t, v / 4.0))
    } yield rows
    for (seed <- 1L to 8L) {
      val rows = sample(evGen, seed)
      val win = 1 + (seed % 100)
      val ev = df("user_id INT, ts TIMESTAMP, value DOUBLE",
        rows.map { case (u, t, v) =>
          Row(Int.box(u), new java.sql.Timestamp(t * 1000L), Double.box(v)) }: _*)
      val got = Ops.rollingWindow(ev, "user_id", "ts", col("value"), win)
        .collect().map(r => (r.getInt(0), r.getTimestamp(1).getTime / 1000L,
          r.getDouble(2), r.getDouble(3), r.getLong(4)))
      // reference: for every row, sum/count of same-user rows in (t-win, t]
      got.foreach { case (u, t, v, sum, n) =>
        val frame = rows.filter { case (u2, t2, _) => u2 == u && t2 <= t && t2 >= t - win }
        val expSum = frame.map { case (_, _, v2) => BigDecimal(v2).setScale(4) }.sum
        assert(n == frame.size && BigDecimal(sum).setScale(4) == expSum,
          s"seed=$seed win=$win row=($u,$t,$v): got ($sum,$n), want ($expSum,${frame.size})")
      }
    }
  }

  test("funnel matches a driver-side greedy reference over random event streams") {
    import org.apache.spark.sql.functions.col
    val evGen: Gen[List[(Int, Long, String)]] = for {
      n <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1, 5)
        t <- Gen.choose(0L, 50L) // coarse → frequent same-instant steps
        e <- Gen.oneOf("view", "click", "buy", "other")
      } yield (u, t, e))
    } yield rows
    val steps = Seq("view", "click", "buy")
    for (seed <- 1L to 8L) {
      val rows = sample(evGen, seed)
      val ev = df("u INT, ts TIMESTAMP, t STRING",
        rows.map { case (u, t, e) =>
          Row(Int.box(u), new java.sql.Timestamp(t * 1000L), e) }: _*)
      val got = Ops.funnel(ev, "u", "ts", "t", steps)
        .collect().map(r => r.getInt(0) ->
          ((1 to 3).map(i => Option(r.getTimestamp(i)).map(_.getTime / 1000L)), r.getInt(4)))
        .toMap
      // reference: earliest completion per step at-or-after the previous
      val want = rows.map(_._1).distinct.flatMap { u =>
        val mine = rows.filter(_._1 == u)
        val chain = steps.foldLeft(List.empty[Option[Long]]) { (acc, st) =>
          val lower = acc.lastOption.getOrElse(Some(Long.MinValue))
          val hit = lower.flatMap(lo =>
            mine.filter(r => r._3 == st && r._2 >= lo).map(_._2).minOption)
          acc :+ hit
        }
        if (chain.head.isEmpty) None
        else Some(u -> ((chain.toIndexedSeq, chain.count(_.isDefined))))
      }.toMap
      assert(got == want, s"seed=$seed: got $got want $want")
    }
  }

  test("groupQuantiles matches a sorted-array reference over random groups") {
    import org.apache.spark.sql.functions.col
    val gen: Gen[List[(String, Int)]] = for {
      n <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("x", "y", "z")
        v <- Gen.choose(0, 15) // small range → heavy ties
      } yield (g, v))
    } yield rows
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    for (seed <- 1L to 8L) {
      val rows = sample(gen, seed)
      val d = df("g STRING, v INT",
        rows.map { case (g, v) => Row(g, Int.box(v)) }: _*)
      val got = Ops.groupQuantiles(d, Seq("g"), col("v"), ps)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), (2 to 5).map(r.getInt).toList))).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(_._2).sorted.toIndexedSeq
        g -> ((rs.size.toLong,
          ps.map(p => sorted(math.ceil(p * sorted.size).toInt - 1)).toList))
      }
      assert(got == want, s"seed=$seed: got $got want $want")
    }
  }

  test("ngramLm matches a driver-side bigram reference") {
    val lmGen: Gen[List[String]] = for {
      n <- Gen.choose(1, 20)
      docs <- Gen.listOfN(n, for {
        len <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.const(1), 8 -> Gen.choose(2, 15))
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      } yield ws.mkString(" "))
    } yield docs
    for (seed <- 1L to 8L) {
      val docs = sample(lmGen, seed)
      val k = 1 + (seed % 3).toInt
      val got = Corpus.ngramLm(toDf(docs), "text", n = 2, k = k)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))).toMap
      val pairs = docs.flatMap(t => { val ts = toks(t); ts.zip(ts.drop(1)) })
      val want = pairs.groupBy(_._1).flatMap { case (p, ps_) =>
        val total = ps_.size.toLong
        ps_.groupBy(_._2).map { case (nx, occ) => (nx, occ.size.toLong) }.toList
          .sortBy { case (nx, c) => (-c, nx) }.take(k).zipWithIndex
          .map { case ((nx, c), i) =>
            (p, nx) -> ((c, total,
              BigDecimal(c.toDouble / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
              i + 1)) }
      }
      assert(got == want, s"seed=$seed k=$k: got $got want $want")
    }
  }

  test("dedupIncremental over any id-ordered batch split equals single-pass exact dedup") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1L to 4L) {
      val docs = sample(corpusGen, seed)
      val ddf = toDf(docs)
      val nBatches = 1 + (seed % 3).toInt
      val root = java.nio.file.Files.createTempDirectory("graft_dedup_prop").toString + "/state"
      // id-ordered batches: earlier batches hold strictly smaller ids, so
      // per-batch min-id-wins composes to the global min-id-wins rule
      val bounds = (0 to nBatches).map(i => i.toLong * docs.size / nBatches)
      val kept = bounds.sliding(2).flatMap { case Seq(lo, hi) =>
        Corpus.dedupIncremental(spark, root,
          ddf.filter(col("doc_id") >= lo && col("doc_id") < hi), "doc_id", "text")
          .collect().map(r => (r.getString(0), r.getLong(1)))
      }.toSet
      val want = graft.operators.Dedup.exact(ddf, "doc_id", "text")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(kept == want, s"seed=$seed batches=$nBatches: got $kept want $want")
    }
  }

  test("TopKAggregator: any reduce/merge split order equals the sorted-take reference") {
    val gen: Gen[List[(Double, Long)]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        v <- Gen.choose(0, 8) // tiny range → constant ties exercising the id tiebreak
        id <- Gen.choose(0L, 1000L)
      } yield (v.toDouble, id))
    } yield rows.distinctBy(_._2)
    for (seed <- 1L to 12L) {
      val rows = sample(gen, seed)
      val k = 1 + (seed % 4).toInt
      val agg = new graft.expressions.TopKAggregator(k)
      // split into random chunks, reduce each, merge in chunk order — the
      // result must not depend on the partitioning
      val nChunks = 1 + (seed % 5).toInt
      val chunks = rows.zipWithIndex.groupBy(_._2 % nChunks).values
        .map(_.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(chunks.foldLeft(agg.zero)(agg.merge))
      val want = rows.sortBy { case (v, id) => (-v, id) }.take(k)
        .map { case (v, id) => graft.expressions.TopKPair(v, id) }
      assert(merged == want, s"seed=$seed k=$k chunks=$nChunks: got $merged want $want")
    }
  }

  test("dedupSegments matches a direct reference implementation") {
    for (seed <- 1L to 8L) {
      val docs = sample(corpusGen, seed)
      val k = 2 + (seed % 2).toInt
      val maxDf = 1 + (seed % 3).toInt
      // reference: tile windows, count distinct-doc frequency, drop hot
      val segs = docs.map(t => toks(t).grouped(k).map(_.mkString(" ")).toVector)
      val dfreq = segs.zipWithIndex.flatMap { case (ss, i) => ss.distinct.map(_ -> i) }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
      val expected = segs.zipWithIndex.map { case (ss, i) =>
        val kept = ss.filter(s => dfreq(s) <= maxDf)
        i.toLong -> ((ss.size.toLong, kept.size.toLong, md5Hex(kept.mkString(" "))))
      }.toMap
      val out = Corpus.dedupSegments(toDf(docs), "doc_id", "text", k, maxDf)
      val got = out.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == expected, s"seed=$seed k=$k maxDf=$maxDf")
      out.unpersist(): Unit
    }
  }

  test("chunkTokens covers every token and matches the reference windows") {
    for (seed <- 1L to 8L) {
      val docs = sample(corpusGen, seed)
      val size = 3 + (seed % 3).toInt
      val stride = 1 + (seed % size.toLong).toInt
      val expected = docs.zipWithIndex.flatMap { case (t, i) =>
        val ts = toks(t)
        if (ts.isEmpty) Nil
        else {
          val nChunks = math.ceil(math.max(ts.size - size, 0) / stride.toDouble).toInt + 1
          (0 until nChunks).map { c =>
            val chunk = ts.slice(c * stride, c * stride + size)
            (i.toLong, c) -> ((chunk.size.toLong, md5Hex(chunk.mkString(" "))))
          }
        }
      }.toMap
      val out = Corpus.chunkTokens(toDf(docs), "doc_id", "text", size, stride)
      val got = out.collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getString(3)))).toMap
      assert(got == expected, s"seed=$seed size=$size stride=$stride")
      // coverage: concatenating stride-prefixes of all but the last chunk,
      // plus the last chunk, reproduces the document
      out.unpersist(): Unit
    }
  }

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("cdcChunks matches a direct reference over collision-heavy corpora") {
    for (seed <- 1L to 8L) {
      val docs = sample(corpusGen, seed)
      val mod = 2 + (seed % 3).toInt // small mod → frequent cuts, many tail cases
      val expected = docs.zipWithIndex.flatMap { case (t, i) =>
        val chunks = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
        var cur = Vector.empty[String]
        toks(t).foreach { tok =>
          cur :+= tok
          if (h32(tok) % mod == 0) { chunks += cur; cur = Vector.empty }
        }
        if (cur.nonEmpty) chunks += cur
        chunks.zipWithIndex.map { case (c, ix) =>
          (i.toLong, ix.toLong) -> ((c.size.toLong, md5Hex(c.mkString(" "))))
        }
      }.toMap
      val out = Corpus.cdcChunks(toDf(docs), "doc_id", "text", mod)
      val got = out.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
      assert(got == expected, s"seed=$seed mod=$mod")
      out.unpersist(): Unit
    }
  }

  test("heavyHittersCms matches a reference grid: exact-or-over, rank and tie order") {
    for (seed <- 1L to 6L) {
      val docs = sample(corpusGen, seed)
      val depth = 1 + (seed % 3).toInt
      val width = Seq(2, 16, 64)((seed % 3).toInt) // width 2 → heavy collisions
      val items = docs.flatMap(t => toks(t))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cells = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
      items.foreach { it =>
        (0 until depth).foreach { r => cells((r, h32(s"$r:$it") % width)) += 1 }
      }
      val est = exact.keys.map(it =>
        it -> (0 until depth).map(r => cells((r, h32(s"$r:$it") % width))).min).toMap
      val expected = exact.keys.toSeq.sortBy(it => (-est(it), it)).take(4).zipWithIndex
        .map { case (it, ix) => it -> ((exact(it), est(it), ix + 1)) }.toMap
      val out = Corpus.heavyHittersCms(toDf(docs), "text", depth, width,
        k = 4, minSupport = 1L)
      val got = out.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
      assert(got == expected, s"seed=$seed depth=$depth width=$width")
      assert(got.values.forall { case (ex, es, _) => es >= ex }, "one-sided error violated")
      out.unpersist(): Unit
    }
  }

  test("kmeansAssign matches a driver-side Lloyd reference") {
    val vecGen: Gen[List[Seq[Float]]] = for {
      n <- Gen.choose(4, 40)
      vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-8, 8).map(_.toFloat / 4f)))
    } yield vs.map(_.toSeq)
    for (seed <- 1L to 6L) {
      val vs = sample(vecGen, seed).zipWithIndex
        // a zero vector has no cosine direction — the operator contract
        // assumes non-degenerate embeddings, as q27's oracle does
        .filter { case (v, _) => v.exists(_ != 0f) }
      val k = 2 + (seed % 2).toInt
      if (vs.size >= k) {
        val data = vs.map { case (v, i) => (i.toLong, v) }
        // reference: quantize, seed from k lowest ids, run iters rounds
        def quant(v: Seq[Float]): Array[Double] =
          v.map(x => math.rint(x.toDouble * 1e6)).toArray
        def cos(a: Array[Double], b: Array[Double]): Double = {
          val dot = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
          val r = dot / (math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x)) *
            math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x)))
          BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        val pts = data.map { case (id, v) => id -> quant(v) }
        var cents = pts.sortBy(_._1).take(k).map(_._2)
        def assign(p: Array[Double]): Int =
          cents.zipWithIndex.map { case (c, j) => (-cos(p, c), j) }.min._2
        for (_ <- 1 until 3) {
          val byCl = pts.groupBy { case (_, p) => assign(p) }
          cents = cents.zipWithIndex.map { case (old, j) =>
            byCl.get(j).fold(old) { members =>
              val arr = new Array[Double](old.length)
              for (d <- old.indices)
                arr(d) = members.map(_._2(d)).sum / members.size
              arr
            }
          }
        }
        val expected = pts.map { case (id, p) => id -> assign(p) }.toMap
        val vdf = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
          data.map { case (id, v) => Row(Long.box(id), v) }: _*)
        val out = Cluster.kmeansAssign(vdf, "vec_id", "embedding", k, iters = 3)
        val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == expected, s"seed=$seed k=$k")
        out.unpersist(): Unit
      }
    }
  }
}
