package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed partial top-k aggregator: per group, the k largest (value, id)
  * pairs ordered by (value desc, id asc). The buffer is a bounded sorted
  * list, so PARTIAL aggregation trims to k map-side — the exchange carries
  * at most k pairs per (group, input partition), where the window-function
  * formulation (`row_number <= k`) shuffles EVERY row of every group to
  * sort it. That asymmetry is the whole point at 100 TB: top-k per key
  * over a fat fact table moves k·partitions rows instead of the table.
  *
  * The id tiebreak makes results deterministic under any partitioning
  * (merge order never matters — CorpusPropertySpec replays random splits).
  * Scala `List` buffer + `Encoders.product` keep the state a plain Spark
  * SQL struct; k is expected small (heap-vs-sorted-list does not matter
  * below ~100).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuffer, Seq[TopKPair]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(pairs: List[TopKPair], v: Double, id: Long): List[TopKPair] = {
    val (front, back) = pairs.span(p => better((p.value, p.id), (v, id)))
    (front ::: TopKPair(v, id) :: back).take(k)
  }

  override def zero: TopKBuffer = TopKBuffer(Nil)

  override def reduce(b: TopKBuffer, row: (Double, Long)): TopKBuffer =
    // skip insertion when the buffer is full and the candidate cannot rank
    if (b.pairs.lengthCompare(k) >= 0 &&
        better((b.pairs.last.value, b.pairs.last.id), row)) b
    else TopKBuffer(insert(b.pairs, row._1, row._2))

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
    TopKBuffer(b.pairs.foldLeft(a.pairs)((acc, p) => insert(acc, p.value, p.id)))

  override def finish(b: TopKBuffer): Seq[TopKPair] = b.pairs

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[TopKPair]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

case class TopKPair(value: Double, id: Long)
case class TopKBuffer(pairs: List[TopKPair])
