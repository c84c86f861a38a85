package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Similarity

/** Edge semantics of the fused quantize→dequantize kernel: must stay
  * bit-identical to the composed HOF form on degenerate inputs, not just
  * on the fixture distribution (PipelineSpec covers that). */
class QuantizeRoundtripSpec extends SparkSpec {

  private def roundtrip(vecs: Seq[Seq[Double]]): (Seq[Seq[Double]], Seq[Seq[Double]]) = {
    import spark.implicits._
    val df = vecs.toDF("v")
    val fused = df.select(
      QuantizeRoundtrip.quantize_roundtrip(col("v")).as("r"))
      .as[Seq[Double]].collect().toSeq
    val hof = df.select(
      Similarity.dequantize(Similarity.quantizeInt8(col("v"))).as("r"))
      .as[Seq[Double]].collect().toSeq
    (fused, hof)
  }

  test("fused kernel matches HOF form on edge vectors bit-for-bit") {
    val cases = Seq(
      Seq(0.0, 0.0, 0.0),                    // all-zero: scale 0, stays 0
      Seq.empty[Double],                     // empty array
      Seq(1.0),                              // single max element → ±127
      Seq(-1.0, 1.0),                        // symmetric signs
      Seq(-0.5, 0.25, -0.125, 1.0),          // exact binary fractions
      Seq(1e-30, -1e-30, 1e-29),             // near the scale guard
      Seq(0.005, -0.015, 1.27),              // decimal-tie-ish quotients
      Seq(127.0, -127.0, 63.5, -63.5),       // exact half quotients
      Seq(1e10, -1e10, 5e9))                 // large magnitudes
    val (fused, hof) = roundtrip(cases)
    fused.zip(hof).zipWithIndex.foreach { case ((f, h), i) =>
      assert(f == h, s"case $i: fused $f != hof $h")
    }
    // sanity: all-zero stays zero, max element maps to exactly itself
    assert(fused.head.forall(_ == 0.0))
    assert(fused(2) == Seq(1.0)) // round(1.0/ (1/127)) = 127; 127*(1/127)=1.0
  }

  test("interpreted (eval) path equals codegen path") {
    import spark.implicits._
    val vecs = Seq(Seq(0.3, -0.7, 0.001, 0.0), Seq(-1.0, 0.5))
    val df = vecs.toDF("v")
    val viaCodegen = df.select(
      QuantizeRoundtrip.quantize_roundtrip(col("v")).as("r"))
      .as[Seq[Double]].collect().toSeq
    // force the interpreted path through the expression's eval
    val expr = QuantizeRoundtripExpr(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false))
    val viaEval = vecs.map { v =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v.toArray))
      expr.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq
    }
    assert(viaCodegen.map(_.toList) == viaEval.map(_.toList))
  }
}
