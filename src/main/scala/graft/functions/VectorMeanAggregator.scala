package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of `array<float>` vectors as a typed Aggregator:
  * partitions fold their vectors into one (double-sum, count) buffer each
  * (map-side combine), so the shuffle moves one dim-length buffer per
  * (group, mapper) instead of every member vector — the pattern that lets
  * a k-means update step run over 100 TB of embeddings with a k×dim-sized
  * reduce. Sums accumulate in Double for associativity-stable precision;
  * the finished mean is cast back to Float (the engine's vector element
  * type).
  */
class VectorMeanAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    // A NULL or jagged corpus must fail with a diagnosable message, not
    // skew (a short vector prefix-summed but still counted in n drags
    // the centroid tail toward zero) or NPE inside v.length.
    require(v != null, s"VectorMeanAggregator(dim=$dim) saw a NULL vector")
    require(v.length == dim,
      s"VectorMeanAggregator(dim=$dim) saw a vector of length ${v.length}")
    val (sums, n) = b
    val a = VectorUdfs.arrF(v) // List-backed Seq indexing is O(i) — see VectorUdfs
    var i = 0
    while (i < dim) { sums(i) += a(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a
    val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  override def finish(b: (Array[Double], Long)): Seq[Float] = {
    val (sums, n) = b
    if (n == 0L) Seq.fill(dim)(0.0f)
    else {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) { out(i) = (sums(i) / n).toFloat; i += 1 }
      out.toSeq
    }
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Float]] =
    ExpressionEncoder[Seq[Float]]()
}
