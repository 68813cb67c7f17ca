package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.2 "reserve Aggregator[IN,BUF,OUT]
  * for a custom similarity-topk agg"): keeps the k largest (score, id)
  * pairs in a bounded buffer with map-side partial merge — the
  * shuffle-light alternative to window-rank top-k when k ≪ group size
  * (per-group traffic is O(k), not O(n)).
  *
  * Order contract matches the window formulation exactly: by score
  * descending, then id ascending (deterministic ties). */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    (in :: buf).sorted(ord).take(k)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
