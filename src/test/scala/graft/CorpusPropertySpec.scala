package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cluster, Corpus}

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
