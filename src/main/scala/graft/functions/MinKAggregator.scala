package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K smallest DISTINCT values of a long column, as a typed Aggregator
  * with an O(k) sorted buffer — the state of a KMV (k-minimum-values)
  * distinct-count sketch. Map-side combine ships at most k longs per
  * (group, mapper); the estimate (k-1)·2^60 / h_k is computed by the
  * caller from the finished buffer.
  *
  * Unlike HLL — whose register layout is engine-specific, forcing the
  * correctness gate down to a rows-only check (g6) — every part of KMV
  * over the md5-derived [[DetHash]] H is portable arithmetic, so an
  * independent engine replays the sketch bit-for-bit (g11's oracle does).
  */
class MinKAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Nil

  private def insert(buf: Seq[Long], x: Long): Seq[Long] = {
    if (buf.contains(x)) buf
    else {
      val merged = (buf :+ x).sorted
      if (merged.length > k) merged.take(k) else merged
    }
  }

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = insert(buf, x)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val merged = (a ++ b).distinct.sorted
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
