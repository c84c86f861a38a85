package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine-similarity kernel as a native Catalyst expression with
  * whole-stage codegen (SURVEY §4.2's "codegen'd cosine-similarity
  * Expression" — promoted from 'deferred' after benchmarks showed the
  * zip_with/aggregate composition evaluates its lambdas interpreted,
  * per element, in the top-k inner loop).
  *
  * Semantics are bit-identical to
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with index-ordered
  * double accumulation — the same contract the DuckDB oracle computes —
  * because each accumulator adds elements in index order.
  *
  * Inputs must be ARRAY<DOUBLE> of equal length with no null elements
  * (all call sites cast the fixed-dim, non-null embedding column).
  * Mismatched lengths accumulate over the common PREFIX — note this is
  * NOT zip_with's semantics, which would null-pad the shorter side and
  * null the whole lambda result; the two forms agree only on equal-length
  * inputs, which is what every caller and the bit-equality spec provide.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** cosine_sim(a, b) over ARRAY<DOUBLE> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    bridge.column(CosineSimExpr(bridge.expression(a), bridge.expression(b)))
}
