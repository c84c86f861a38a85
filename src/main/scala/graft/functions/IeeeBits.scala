package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType}

/** IEEE-754 bit patterns as native Catalyst expressions — the one
  * primitive Spark lacks for WIRE-FORMAT serialization of floating
  * point: `hex`/`unhex`/`lpad` compose every integer-shaped encoding,
  * but a float's protocol bytes are its raw bit pattern, and a UDF here
  * would break whole-stage codegen inside the per-element lambda of a
  * `transform()` over 15,000-sample arrays (the reference's raw watts
  * rows, core.clj:41). One JVM intrinsic per value, (b)-preference
  * custom Expression like [[NfcNormalizeExpr]].
  *
  * `floatToIntBits` (not Raw) canonicalizes NaNs — exactly what a wire
  * encoder wants: one replayable byte pattern per logical value. */
case class FloatBitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == FloatType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_bits wants FLOAT, got ${child.dataType.sql}")
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Float.floatToIntBits($c)")
  override protected def withNewChildInternal(
      newChild: Expression): FloatBitsExpr = copy(child = newChild)
}

/** [[FloatBitsExpr]] for doubles. */
case class DoubleBitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_bits wants DOUBLE, got ${child.dataType.sql}")
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToLongBits($c)")
  override protected def withNewChildInternal(
      newChild: Expression): DoubleBitsExpr = copy(child = newChild)
}

object IeeeBits {
  /** float_bits(c): INT bit pattern of a FLOAT column (NaN-canonical). */
  def float_bits(c: Column): Column =
    bridge.column(FloatBitsExpr(bridge.expression(c)))

  /** double_bits(c): BIGINT bit pattern of a DOUBLE column. */
  def double_bits(c: Column): Column =
    bridge.column(DoubleBitsExpr(bridge.expression(c)))
}
