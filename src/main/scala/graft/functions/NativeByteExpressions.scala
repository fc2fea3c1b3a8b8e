package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared kernel for [[BlockMeanHash48]] — also callable from plain Scala
  * (tests, [[graft.queries.MultimodalOps]]'s stub codec neighbours).
  *
  * The arithmetic is the exact integer spec the DuckDB oracle replays
  * (see MultimodalOps.oracles "mm5_perceptual_hash"): 48 equal byte
  * ranges, bit b = 1 iff `sum_b · L > total · n_b` — block means are
  * never materialized as floats, so the hash is bit-identical across
  * engines. Blocks shorter than one byte (L < 48) contribute bit 0 on
  * both sides (`0 > 0`).
  *
  * Exactness bound: `sum_b ≤ 255·L`, so `sum_b · L` stays below 2^63 for
  * L ≤ ~190 MB — far above any sane single binary cell (Spark caps cells
  * at 2 GB; media payloads that large belong in object storage with a
  * pointer column, not in a cell).
  */
object BlockMeanHashKernel {
  val Bits = 48

  def hash(bytes: Array[Byte]): Long = {
    val len = bytes.length
    val L = len.toLong
    var total = 0L
    var i = 0
    while (i < len) { total += (bytes(i) & 0xff); i += 1 }
    var h = 0L
    var b = 0
    while (b < Bits) {
      // 1-based positions (b·L div 48, (b+1)·L div 48] = 0-based [lo, hi)
      val lo = (b * L / Bits).toInt
      val hi = ((b + 1) * L / Bits).toInt
      if (hi > lo) {
        var s = 0L
        var j = lo
        while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
        if (s * L > total * (hi - lo)) h += (1L << b)
      }
      b += 1
    }
    h
  }
}

/** 48-bit block-mean perceptual hash of a BINARY payload (Yang, Gu & Niu
  * 2006), as a whole-stage-codegen'd Catalyst expression.
  *
  * This replaces an earlier SQL higher-order-function formulation in
  * [[graft.ops.MediaDedup.blockMeanHash]] that was quadratic in the
  * payload length: the per-byte access idiom
  * `conv(hex(substring(payload, i, 1)), 16, 10)` inside an `aggregate`
  * lambda re-evaluates its `payload` argument per element, and when the
  * payload column is itself an expression (e.g. `encode(text, 'UTF-8')`),
  * `CollapseProject` inlines it — so an L-byte document was re-encoded L
  * times (O(L²) bytes copied per row; a 9 KB document cost ~87 M byte
  * copies). Here the payload child is evaluated ONCE per row and the
  * kernel makes two O(L) passes over the byte array. The SQL HOF chain
  * was also `CodegenFallback` (interpreted per row); this participates in
  * whole-stage codegen — the same HOF-vs-kernel lesson as
  * [[NativeVectorExpressions]]'s vec_dot.
  *
  * Registered as SQL function `block_mean_hash48` by
  * [[NativeVectorExpressions.register]].
  */
case class BlockMeanHash48(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  // ImplicitCastInputTypes (not bare ExpectsInputTypes): the earlier SQL
  // HOF form accepted STRING payloads via Catalyst's standard
  // string→binary coercion; external MediaDedup.blockMeanHash callers
  // keep that contract instead of a silent analysis-time narrowing.

  override def dataType: DataType = LongType
  override def prettyName: String = "block_mean_hash48"
  override def inputTypes = Seq(BinaryType)

  override def nullSafeEval(a: Any): Any =
    BlockMeanHashKernel.hash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BlockMeanHashKernel.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
