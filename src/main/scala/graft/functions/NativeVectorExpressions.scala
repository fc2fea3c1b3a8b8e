package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Catalyst-native float-vector kernels (SURVEY.md §7.4 preference order:
  * custom codegen'd `Expression` > Scala UDF). Unlike the UDF forms in
  * [[VectorUdfs]], these participate in whole-stage codegen and read
  * `ArrayData` directly — no Seq boxing per row. The arithmetic is the
  * same sequential left-to-right double fold, so results remain
  * bit-identical to the DuckDB oracle's `list_sum`.
  *
  * Registered as SQL functions `vec_dot` / `vec_norm2` by [[register]].
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // array<float> only: getFloat on a wider element type would silently
  // reinterpret the slot bytes, so misuse must fail at analysis time.
  // (return type inferred: AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class FloatVectorNorm2(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm2"
  override def inputTypes = Seq(ArrayType(FloatType))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NativeVectorExpressions {
  /** Idempotently register vec_dot / vec_norm2 (and the self-dot rewrite
    * rule) on the session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "internal")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm2", exprs => FloatVectorNorm2(exprs.head), "internal")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "block_mean_hash48", exprs => BlockMeanHash48(exprs.head), "internal")
    if (!spark.experimental.extraOptimizations.contains(SelfDotToNorm)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotToNorm
    }
  }
}
