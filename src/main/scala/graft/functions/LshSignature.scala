package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature as a single codegen kernel: bit p of
  * the result is the sign of dot(v, plane_p). Bit-identical to the
  * composed `aggregate(zip_with(...))` form (index-ordered double
  * accumulation per plane, strict `> 0` threshold — asserted in
  * PipelineSpec), but one generated loop nest instead of `bits`
  * interpreted lambda evaluations per row.
  *
  * This is the per-row hot kernel of the unbounded ANN path
  * (Similarity.lshTopK): at 100 TB every corpus vector pays exactly one
  * signature projection, so it must be codegen, like the cosine kernel
  * it feeds. The planes arrive as a constructor constant (plan literal —
  * no model state on executors) via `ctx.addReferenceObj`.
  *
  * PRECONDITION: the input array must have exactly `dim` elements, none
  * null. Length mismatches fail loudly (one compare per row — the HOF
  * form would instead silently null-pad, yielding bit 0 everywhere, and
  * the fused form would otherwise silently truncate; neither is a
  * signature anyone asked for). Null elements are NOT checked per element
  * (that would put a branch in the innermost loop of the hottest kernel);
  * callers reach this through a cast from the non-null embedding column.
  */
case class LshSignatureExpr(child: Expression, planes: Seq[IndexedSeq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // flattened [bits][dim] for cheap codegen indexing
  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  private def dim: Int = planes.head.length
  private def bits: Int = planes.length

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"lsh_signature: expected array of exactly $dim elements, got ${v.numElements()}")
    }
    var sig = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v.getDouble(i) * flat(p * dim + i); i += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "lsh_signature: expected array of exactly $dim elements, got " + $a.numElements());
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < $bits; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += $a.getDouble($i) * $planesRef[$p * $dim + $i];
         |  }
         |  if ($dot > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LshSignatureExpr = copy(child = newChild)
}

object LshSignature {
  /** lsh_signature(v) over an ARRAY<DOUBLE> column with literal planes. */
  def lsh_signature(v: Column, planes: Seq[IndexedSeq[Double]]): Column =
    bridge.column(LshSignatureExpr(bridge.expression(v), planes))
}
