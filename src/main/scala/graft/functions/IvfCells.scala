package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** IVF coarse-quantizer cell assignment as a single codegen kernel: the
  * `nprobe` centroid LABELS nearest (by cosine) to the input vector,
  * best first; score ties break toward the larger label, matching the
  * struct-greatest/sort_array ordering of the literal-centroid path in
  * `Similarity.ivfTopK`.
  *
  * This exists because the literal-centroid path's codegen grows O(nlist)
  * (one `greatest()` struct comparison chain per centroid): fine at the
  * oracle-checked nlist=16, hopeless at the √n (~10⁴) the IVF design
  * point promises. Here the centroid matrix, its precomputed norms, and
  * the labels ride along as ONE `ctx.addReferenceObj` each — the
  * generated code is a fixed-size loop nest whatever nlist is, the
  * per-row cost is exactly nlist fused dot products, and executors still
  * carry no out-of-plan model state. One kernel serves both sides of the
  * operator: corpus rows ask for nprobe=1 (their cell), query rows for
  * nprobe=k (their probe list).
  *
  * PRECONDITION (as [[LshSignatureExpr]]): exactly `dim` elements, none
  * null. Length mismatches fail loudly; null elements are not checked
  * per element to keep the innermost loop branch-free.
  */
case class IvfCellsExpr(child: Expression, centroids: Array[Double],
    labels: Array[Long], dim: Int, nprobe: Int) extends UnaryExpression {

  require(centroids.length == labels.length * dim,
    s"centroid matrix ${centroids.length} != nlist ${labels.length} × dim $dim")
  require(nprobe >= 1, "nprobe must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def nlist: Int = labels.length

  /** Precomputed centroid norms: the kernel pays one sqrt per centroid
    * per row instead of re-walking the centroid for its own norm. */
  @transient private lazy val norms: Array[Double] = Array.tabulate(nlist) { j =>
    var s = 0.0
    var i = 0
    while (i < dim) { val x = centroids(j * dim + i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"ivf_cells: expected array of exactly $dim elements, got ${v.numElements()}")
    }
    var vn = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    val bs = new Array[Double](nprobe)
    val bc = new Array[Long](nprobe)
    var filled = 0
    var j = 0
    while (j < nlist) {
      var dot = 0.0
      val off = j * dim
      i = 0
      while (i < dim) { dot += v.getDouble(i) * centroids(off + i); i += 1 }
      val s = dot / (vn * norms(j))
      val id = labels(j)
      val beatsLast = filled < nprobe || s > bs(filled - 1) ||
        (s == bs(filled - 1) && id > bc(filled - 1))
      if (beatsLast) {
        var p = if (filled < nprobe) { filled += 1; filled - 1 } else nprobe - 1
        while (p > 0 && (s > bs(p - 1) || (s == bs(p - 1) && id > bc(p - 1)))) {
          bs(p) = bs(p - 1); bc(p) = bc(p - 1); p -= 1
        }
        bs(p) = s; bc(p) = id
      }
      j += 1
    }
    new GenericArrayData(bc.take(filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
      val nRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
      val lRef = ctx.addReferenceObj("ivfLabels", labels, "long[]")
      val vn = ctx.freshName("vn")
      val bs = ctx.freshName("bs")
      val bc = ctx.freshName("bc")
      val filled = ctx.freshName("filled")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val id = ctx.freshName("id")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      val beats = ctx.freshName("beats")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "ivf_cells: expected array of exactly $dim elements, got " + $a.numElements());
         |}
         |double $vn = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double x = $a.getDouble($i); $vn += x * x;
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |double[] $bs = new double[$nprobe];
         |long[] $bc = new long[$nprobe];
         |int $filled = 0;
         |for (int $j = 0; $j < $nlist; $j++) {
         |  double $dot = 0.0;
         |  int $off = $j * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += $a.getDouble($i) * $cRef[$off + $i];
         |  }
         |  double $s = $dot / ($vn * $nRef[$j]);
         |  long $id = $lRef[$j];
         |  boolean $beats = $filled < $nprobe || $s > $bs[$filled - 1] ||
         |    ($s == $bs[$filled - 1] && $id > $bc[$filled - 1]);
         |  if ($beats) {
         |    int $p;
         |    if ($filled < $nprobe) { $p = $filled; $filled++; } else { $p = $nprobe - 1; }
         |    while ($p > 0 && ($s > $bs[$p - 1] ||
         |        ($s == $bs[$p - 1] && $id > $bc[$p - 1]))) {
         |      $bs[$p] = $bs[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |    }
         |    $bs[$p] = $s; $bc[$p] = $id;
         |  }
         |}
         |long[] $out = new long[$filled];
         |System.arraycopy($bc, 0, $out, 0, $filled);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): IvfCellsExpr = copy(child = newChild)
}

object IvfCells {
  /** ivf_cells(v): top-`nprobe` centroid labels for an ARRAY<DOUBLE>
    * column, cosine-nearest first. */
  def ivf_cells(v: Column, centroids: Array[Array[Double]],
      labels: Array[Long], nprobe: Int): Column = {
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    bridge.column(IvfCellsExpr(bridge.expression(v),
      centroids.flatten, labels, dim, nprobe))
  }
}
