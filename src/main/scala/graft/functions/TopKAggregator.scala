package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.9 UDAF surface): exact
  * per-group top-k of (value, id) pairs with a bounded buffer — the
  * partial-aggregate (map-side combine) form of top-k-per-group, vs the
  * window row_number form the oracle replays. The buffer never exceeds k
  * entries, so memory is O(k) per group regardless of group size —
  * shuffle traffic carries k pairs per group per map partition instead
  * of every row.
  *
  * Ordering: value DESC, then id ASC (ties deterministic).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val merged = (buf :+ x).sortWith(ord)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val merged = (a ++ b).sortWith(ord)
    if (merged.length > k) merged.take(k) else merged
  }

  // emit as array<struct<_1: value, _2: id>> — ids stay Long end to end
  // (routing them through Double would corrupt keys above 2^53)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
