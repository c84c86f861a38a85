package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** TWO-LEVEL IVF cell assignment: score `nsuper` super-centroids, keep the
  * best `superProbe`, then scan only those supers' child centroids and
  * return the top-`nprobe` child LABELS (cosine desc, larger label on
  * ties — the same ordering as [[IvfCellsExpr]]).
  *
  * This removes the flat kernel's remaining scale bound: [[IvfCellsExpr]]
  * made codegen size independent of nlist, but each row still pays nlist
  * dot products. Here a row pays nsuper + (children under superProbe
  * supers) ≈ (1 + superProbe)·√nlist dot products when nsuper ≈ √nlist —
  * at nlist = 4096 and superProbe = 4 that is ~20× less arithmetic per
  * row. The price is approximation: a vector whose true nearest child
  * hangs under an unprobed super is mis-assigned; superProbe trades that
  * residual recall against cost exactly like nprobe does at query time.
  * Corpus cells and query probe lists both come from THIS kernel, so the
  * bucket join stays self-consistent.
  *
  * Children are stored grouped by their super (flat matrix + offsets);
  * all model state rides as `ctx.addReferenceObj` constants — fixed-size
  * generated code, nothing on executors beyond the plan.
  *
  * PRECONDITION (as [[IvfCellsExpr]]): exactly `dim` elements, non-null.
  */
case class Ivf2CellsExpr(child: Expression,
    superCents: Array[Double],
    childCents: Array[Double], childLabels: Array[Long],
    offsets: Array[Int], dim: Int, superProbe: Int, nprobe: Int)
    extends UnaryExpression {

  private def nsuper: Int = offsets.length - 1

  require(superCents.length == nsuper * dim, "super matrix shape mismatch")
  require(childCents.length == childLabels.length * dim,
    "child matrix shape mismatch")
  require(offsets.head == 0 && offsets.last == childLabels.length &&
    offsets.sliding(2).forall(p => p(0) <= p(1)), "bad offsets")
  require(superProbe >= 1 && nprobe >= 1, "probes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val superNorms: Array[Double] =
    Ivf2Cells.norms(superCents, dim)
  @transient private lazy val childNorms: Array[Double] =
    Ivf2Cells.norms(childCents, dim)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"ivf2_cells: expected array of exactly $dim elements, got ${v.numElements()}")
    }
    var vn = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    // stage 1: top-superProbe supers (score desc, larger index on ties)
    val sp = math.min(superProbe, nsuper)
    val ss = new Array[Double](sp)
    val sj = new Array[Int](sp)
    var sFilled = 0
    var j = 0
    while (j < nsuper) {
      var dot = 0.0
      val off = j * dim
      i = 0
      while (i < dim) { dot += v.getDouble(i) * superCents(off + i); i += 1 }
      val s = dot / (vn * superNorms(j))
      if (sFilled < sp || s > ss(sFilled - 1) ||
          (s == ss(sFilled - 1) && j > sj(sFilled - 1))) {
        var p = if (sFilled < sp) { sFilled += 1; sFilled - 1 } else sp - 1
        while (p > 0 && (s > ss(p - 1) || (s == ss(p - 1) && j > sj(p - 1)))) {
          ss(p) = ss(p - 1); sj(p) = sj(p - 1); p -= 1
        }
        ss(p) = s; sj(p) = j
      }
      j += 1
    }
    // stage 2: top-nprobe children within the selected supers
    val bs = new Array[Double](nprobe)
    val bc = new Array[Long](nprobe)
    var filled = 0
    var k = 0
    while (k < sFilled) {
      var c = offsets(sj(k))
      val end = offsets(sj(k) + 1)
      while (c < end) {
        var dot = 0.0
        val off = c * dim
        i = 0
        while (i < dim) { dot += v.getDouble(i) * childCents(off + i); i += 1 }
        val s = dot / (vn * childNorms(c))
        val id = childLabels(c)
        if (filled < nprobe || s > bs(filled - 1) ||
            (s == bs(filled - 1) && id > bc(filled - 1))) {
          var p = if (filled < nprobe) { filled += 1; filled - 1 } else nprobe - 1
          while (p > 0 && (s > bs(p - 1) || (s == bs(p - 1) && id > bc(p - 1)))) {
            bs(p) = bs(p - 1); bc(p) = bc(p - 1); p -= 1
          }
          bs(p) = s; bc(p) = id
        }
        c += 1
      }
      k += 1
    }
    new GenericArrayData(bc.take(filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val scRef = ctx.addReferenceObj("ivf2Super", superCents, "double[]")
      val snRef = ctx.addReferenceObj("ivf2SuperNorms", superNorms, "double[]")
      val ccRef = ctx.addReferenceObj("ivf2Child", childCents, "double[]")
      val cnRef = ctx.addReferenceObj("ivf2ChildNorms", childNorms, "double[]")
      val clRef = ctx.addReferenceObj("ivf2Labels", childLabels, "long[]")
      val ofRef = ctx.addReferenceObj("ivf2Offsets", offsets, "int[]")
      val sp = math.min(superProbe, nsuper)
      val vn = ctx.freshName("vn")
      val ss = ctx.freshName("ss")
      val sjv = ctx.freshName("sj")
      val sFilled = ctx.freshName("sFilled")
      val bs = ctx.freshName("bs")
      val bc = ctx.freshName("bc")
      val filled = ctx.freshName("filled")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val end = ctx.freshName("end")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val id = ctx.freshName("id")
      val p = ctx.freshName("p")
      val beats = ctx.freshName("beats")
      val out = ctx.freshName("out")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "ivf2_cells: expected array of exactly $dim elements, got " + $a.numElements());
         |}
         |double $vn = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double x = $a.getDouble($i); $vn += x * x;
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |double[] $ss = new double[$sp];
         |int[] $sjv = new int[$sp];
         |int $sFilled = 0;
         |for (int $j = 0; $j < $nsuper; $j++) {
         |  double $dot = 0.0;
         |  int $off = $j * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += $a.getDouble($i) * $scRef[$off + $i];
         |  }
         |  double $s = $dot / ($vn * $snRef[$j]);
         |  boolean $beats = $sFilled < $sp || $s > $ss[$sFilled - 1] ||
         |    ($s == $ss[$sFilled - 1] && $j > $sjv[$sFilled - 1]);
         |  if ($beats) {
         |    int $p;
         |    if ($sFilled < $sp) { $p = $sFilled; $sFilled++; } else { $p = $sp - 1; }
         |    while ($p > 0 && ($s > $ss[$p - 1] ||
         |        ($s == $ss[$p - 1] && $j > $sjv[$p - 1]))) {
         |      $ss[$p] = $ss[$p - 1]; $sjv[$p] = $sjv[$p - 1]; $p--;
         |    }
         |    $ss[$p] = $s; $sjv[$p] = $j;
         |  }
         |}
         |double[] $bs = new double[$nprobe];
         |long[] $bc = new long[$nprobe];
         |int $filled = 0;
         |for (int $k = 0; $k < $sFilled; $k++) {
         |  int $end = $ofRef[$sjv[$k] + 1];
         |  for (int $c = $ofRef[$sjv[$k]]; $c < $end; $c++) {
         |    double $dot = 0.0;
         |    int $off = $c * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $a.getDouble($i) * $ccRef[$off + $i];
         |    }
         |    double $s = $dot / ($vn * $cnRef[$c]);
         |    long $id = $clRef[$c];
         |    boolean $beats = $filled < $nprobe || $s > $bs[$filled - 1] ||
         |      ($s == $bs[$filled - 1] && $id > $bc[$filled - 1]);
         |    if ($beats) {
         |      int $p;
         |      if ($filled < $nprobe) { $p = $filled; $filled++; } else { $p = $nprobe - 1; }
         |      while ($p > 0 && ($s > $bs[$p - 1] ||
         |          ($s == $bs[$p - 1] && $id > $bc[$p - 1]))) {
         |        $bs[$p] = $bs[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |      }
         |      $bs[$p] = $s; $bc[$p] = $id;
         |    }
         |  }
         |}
         |long[] $out = new long[$filled];
         |System.arraycopy($bc, 0, $out, 0, $filled);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Ivf2CellsExpr = copy(child = newChild)
}

object Ivf2Cells {

  private[functions] def norms(flat: Array[Double], dim: Int): Array[Double] =
    Array.tabulate(flat.length / dim) { j =>
      var s = 0.0
      var i = 0
      while (i < dim) { val x = flat(j * dim + i); s += x * x; i += 1 }
      math.sqrt(s)
    }

  /** Driver-side build of the two-level index from a flat centroid list:
    * the first ceil(sqrt(nlist)) centroids become the supers, every
    * centroid is attached to its cosine-nearest super (larger index wins
    * ties), and children are laid out grouped by super. Pure local math —
    * nlist × nsuper × dim flops at build time. */
  def build(cents: Array[Array[Double]], labels: Array[Long])
      : (Array[Double], Array[Double], Array[Long], Array[Int]) = {
    val dim = cents.head.length
    val nsuper = math.max(1, math.ceil(math.sqrt(cents.length)).toInt)
    val supers = cents.take(nsuper)
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < dim) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val home = cents.map { cv =>
      var best = 0; var bestS = Double.NegativeInfinity
      for (sjx <- supers.indices) {
        val sc = cos(cv, supers(sjx))
        if (sc > bestS || (sc == bestS && sjx > best)) { best = sjx; bestS = sc }
      }
      best
    }
    val bySuper = cents.indices.groupBy(home).withDefaultValue(Seq.empty)
    val order = (0 until nsuper).flatMap(bySuper(_))
    val offsets = new Array[Int](nsuper + 1)
    for (sjx <- 0 until nsuper) offsets(sjx + 1) = offsets(sjx) + bySuper(sjx).size
    (supers.flatten, order.flatMap(cents(_)).toArray,
      order.map(labels(_)).toArray, offsets)
  }

  /** ivf2_cells(v): top-`nprobe` child labels via two-level search. */
  def ivf2_cells(v: Column, cents: Array[Array[Double]], labels: Array[Long],
      superProbe: Int, nprobe: Int): Column = {
    val dim = cents.head.length
    val (sc, cc, cl, of) = build(cents, labels)
    bridge.column(Ivf2CellsExpr(bridge.expression(v), sc, cc, cl, of, dim,
      superProbe, nprobe))
  }
}
