package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused int8 quantize→dequantize kernel as a native codegen expression.
  *
  * Bit-identical to the composed-builtin form
  * `Similarity.dequantize(Similarity.quantizeInt8(v))` (asserted in
  * PipelineSpec), but one codegen pass instead of four interpreted
  * higher-order-function evaluations per row: scale = max|x|/127, each
  * component rounded half-away-from-zero into [-127,127] TINYINT, then
  * scaled back to double. The half-away-from-zero branch replicates both
  * Spark's `round` (BigDecimal HALF_UP) and DuckDB's `round` (std::round)
  * exactly on the binary value, so the e6 oracle can replay it.
  *
  * Why it matters: the HOF composition is interpreted per element, and
  * whole-stage codegen may defer a streamed-side projection into a join's
  * inner loop — re-evaluating the chain per joined PAIR (the r1 bench
  * pathology: 37.7 s for e6). A single cheap codegen kernel is robust to
  * evaluation placement and is the right shape for quantized storage at
  * 100 TB (4× smaller vectors in every scan/shuffle/broadcast).
  */
case class QuantizeRoundtripExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) { mx = math.max(mx, math.abs(v.getDouble(i))); i += 1 }
    val scale = mx / 127.0
    val guard = math.max(scale, 1e-30)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val q = v.getDouble(i) / guard
      val aq = math.abs(q)
      val f = math.floor(aq)
      val r = if (aq - f >= 0.5) f + 1.0 else f
      out(i) = (if (q < 0) -r else r).toByte.toDouble * scale
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val scale = ctx.freshName("scale")
      val guard = ctx.freshName("guard")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      val aq = ctx.freshName("aq")
      val f = ctx.freshName("f")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $mx = java.lang.Math.max($mx, java.lang.Math.abs($a.getDouble($i)));
         |}
         |double $scale = $mx / 127.0;
         |double $guard = java.lang.Math.max($scale, 1e-30);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $q = $a.getDouble($i) / $guard;
         |  double $aq = java.lang.Math.abs($q);
         |  double $f = java.lang.Math.floor($aq);
         |  double $r = ($aq - $f >= 0.5) ? $f + 1.0 : $f;
         |  $out[$i] = (double)(byte)($q < 0 ? -$r : $r) * $scale;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeRoundtripExpr = copy(child = newChild)
}

object QuantizeRoundtrip {
  /** quantize_roundtrip(v) over an ARRAY<DOUBLE> column. */
  def quantize_roundtrip(v: Column): Column =
    bridge.column(QuantizeRoundtripExpr(bridge.expression(v)))
}
