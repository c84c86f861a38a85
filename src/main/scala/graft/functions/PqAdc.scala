package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (the e8 path of `Similarity.pqTopK`):
  * encode a vector to `m` sub-space codebook codes, and score a query
  * against an encoded row by asymmetric distance (L2² to the codebook
  * reconstruction). Both are fixed-size codegen loop nests with the
  * codebook riding along as ONE reference object — the same design as
  * [[IvfCellsExpr]], and for the same reason: the HOF form's generated
  * code grows O(m·ksub) and allocates per row (struct argmin chains,
  * flatten of selected sub-vectors), hopeless at production codebook
  * sizes, while the kernel's per-row cost is exactly m·ksub·sub fused
  * multiply-adds (encode) or dim (ADC).
  *
  * Bit-compatibility contract (gate-relevant): both kernels accumulate
  * in the SAME order as the HOF forms they replace — encode folds each
  * sub-distance over i ascending, ADC folds over the full dimension in
  * j-major/i-minor order, which is exactly array order of the flattened
  * reconstruction. Equivalence is spec-asserted (PipelineSpec).
  *
  * Codebook layout: flattened [j][c][i] — offset ((j·ksub)+c)·sub + i.
  *
  * PRECONDITION (as [[LshSignatureExpr]]): vectors have exactly `dim`
  * elements, codes exactly `m`, none null.
  */
case class PqEncodeExpr(child: Expression, codebook: Array[Double],
    dim: Int, m: Int, ksub: Int) extends UnaryExpression {

  require(dim % m == 0, s"dim=$dim not divisible by m=$m")
  private def sub: Int = dim / m
  require(codebook.length == m * ksub * sub,
    s"codebook ${codebook.length} != m $m × ksub $ksub × sub $sub")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"pq_encode: expected array of exactly $dim elements, got ${v.numElements()}")
    }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val off = ((j * ksub) + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val t = v.getDouble(j * sub + i) - codebook(off + i)
          d += t * t
          i += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: expected array of exactly $dim elements, got " + $a.numElements());
         |}
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.MAX_VALUE;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $off = (($j * $ksub) + $c) * $sub;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $t = $a.getDouble($j * $sub + $i) - $cbRef[$off + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeExpr = copy(child = newChild)
}

/** Asymmetric distance: L2² between an exact query vector (left) and the
  * codebook reconstruction of a code array (right).
  *
  * Numeric contract (round-10 revision): the distance is the sum, over
  * subspaces j ascending, of per-subspace partial sums Σ_i (q−cb)² (each
  * folded i ascending). This per-subspace parenthesization is EXACTLY
  * what [[PqLutAdcExpr]] computes from a hoisted [[PqLutExpr]] table —
  * the direct kernel, the LUT path, the HOF reference form
  * (`Similarity.pqAdcHof`), and the DuckDB oracles (e8/e9/e11/e12) all
  * share this fold, so direct ≡ LUT is bit-identical (spec-asserted),
  * not merely 6-dp-equal. */
case class PqAdcExpr(left: Expression, right: Expression,
    codebook: Array[Double], dim: Int, m: Int, ksub: Int)
    extends BinaryExpression {

  require(dim % m == 0, s"dim=$dim not divisible by m=$m")
  private def sub: Int = dim / m
  require(codebook.length == m * ksub * sub,
    s"codebook ${codebook.length} != m $m × ksub $ksub × sub $sub")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(q: Any, codes: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val cd = codes.asInstanceOf[ArrayData]
    if (v.numElements() != dim || cd.numElements() != m) {
      throw new IllegalArgumentException(
        s"pq_adc: expected vec[$dim] and codes[$m], got " +
          s"${v.numElements()} and ${cd.numElements()}")
    }
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = cd.getInt(j)
      // a code >= ksub at subspace j < m-1 would keep the flat offset in
      // bounds and silently read ANOTHER subspace's entries — bound-check
      // the code itself, matching the length checks above
      if (c < 0 || c >= ksub) {
        throw new IllegalArgumentException(
          s"pq_adc: code $c at subspace $j outside [0, $ksub)")
      }
      val off = ((j * ksub) + c) * sub
      var d = 0.0
      var i = 0
      while (i < sub) {
        val t = v.getDouble(j * sub + i) - codebook(off + i)
        d += t * t
        i += 1
      }
      acc += d
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val c = ctx.freshName("c")
      s"""
         |if ($a.numElements() != $dim || $b.numElements() != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: expected vec[$dim] and codes[$m], got " +
         |    $a.numElements() + " and " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = $b.getInt($j);
         |  if ($c < 0 || $c >= $ksub) {
         |    throw new IllegalArgumentException(
         |      "pq_adc: code " + $c + " at subspace " + $j + " outside [0, $ksub)");
         |  }
         |  int $off = (($j * $ksub) + $c) * $sub;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $sub; $i++) {
         |    double $t = $a.getDouble($j * $sub + $i) - $cbRef[$off + $i];
         |    $d += $t * $t;
         |  }
         |  $acc += $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** Per-query ADC lookup table — the table-hoisting half of the classic
  * PQ serving optimization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", §IV-A): for ONE query vector, precompute
  * LUT[j·ksub + c] = Σ_i (q[j·sub+i] − codebook[j][c][i])² for every
  * (subspace j, code c). Cost is m·ksub·sub = dim·ksub fused
  * multiply-adds — paid ONCE PER QUERY ROW (the column is computed on
  * the broadcast probe side BEFORE the candidate join), after which
  * every candidate costs only m array reads ([[PqLutAdcExpr]]) instead
  * of dim FMAs. At c candidates/query the flop count drops from c·dim
  * to dim·ksub + c·m — for the e9 shape (dim 64, m 8, ksub 16) an 8×
  * per-candidate reduction, repaid once c > ksub·m/(m−1) ≈ 18.
  *
  * Each LUT entry folds i ascending — identical to the inner loop of
  * [[PqAdcExpr]], so the LUT path reproduces the direct kernel
  * bit-for-bit. Output layout is j-major: entry (j, c) at j·ksub + c. */
case class PqLutExpr(child: Expression, codebook: Array[Double],
    dim: Int, m: Int, ksub: Int) extends UnaryExpression {

  require(dim % m == 0, s"dim=$dim not divisible by m=$m")
  private def sub: Int = dim / m
  require(codebook.length == m * ksub * sub,
    s"codebook ${codebook.length} != m $m × ksub $ksub × sub $sub")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"pq_lut: expected array of exactly $dim elements, got ${v.numElements()}")
    }
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val off = ((j * ksub) + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val t = v.getDouble(j * sub + i) - codebook(off + i)
          d += t * t
          i += 1
        }
        out(j * ksub + c) = d
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_lut: expected array of exactly $dim elements, got " + $a.numElements());
         |}
         |double[] $out = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $off = (($j * $ksub) + $c) * $sub;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $t = $a.getDouble($j * $sub + $i) - $cbRef[$off + $i];
         |      $d += $t * $t;
         |    }
         |    $out[$j * $ksub + $c] = $d;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqLutExpr = copy(child = newChild)
}

/** ADC from a hoisted lookup table: Σ_j LUT[j·ksub + codes[j]], folded
  * j ascending — m array reads and adds per candidate, no codebook, no
  * floating-point subtractions. Bit-identical to [[PqAdcExpr]] on the
  * same (query, codes) pair because each LUT entry IS the direct
  * kernel's per-subspace partial sum and both fold those partials in
  * the same order (spec-asserted in PipelineSpec). */
case class PqLutAdcExpr(left: Expression, right: Expression,
    m: Int, ksub: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(lut: Any, codes: Any): Any = {
    val l = lut.asInstanceOf[ArrayData]
    val cd = codes.asInstanceOf[ArrayData]
    if (l.numElements() != m * ksub || cd.numElements() != m) {
      throw new IllegalArgumentException(
        s"pq_lut_adc: expected lut[${m * ksub}] and codes[$m], got " +
          s"${l.numElements()} and ${cd.numElements()}")
    }
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = cd.getInt(j)
      // same unchecked-offset gap as the direct kernel: an out-of-range
      // code at j < m-1 reads another subspace's LUT slice — fail instead
      if (c < 0 || c >= ksub) {
        throw new IllegalArgumentException(
          s"pq_lut_adc: code $c at subspace $j outside [0, $ksub)")
      }
      acc += l.getDouble(j * ksub + c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |if ($a.numElements() != ${m * ksub} || $b.numElements() != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_lut_adc: expected lut[${m * ksub}] and codes[$m], got " +
         |    $a.numElements() + " and " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = $b.getInt($j);
         |  if ($c < 0 || $c >= $ksub) {
         |    throw new IllegalArgumentException(
         |      "pq_lut_adc: code " + $c + " at subspace " + $j + " outside [0, $ksub)");
         |  }
         |  $acc += $a.getDouble($j * $ksub + $c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqLutAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Flatten a [j][c] codebook of sub-vectors to the kernel layout. */
  def flat(cb: Array[Array[Array[Double]]]): Array[Double] =
    cb.flatten.flatten

  def pq_encode(v: Column, cb: Array[Array[Array[Double]]], dim: Int): Column =
    bridge.column(PqEncodeExpr(bridge.expression(v), flat(cb),
      dim, cb.length, cb.head.length))

  def pq_adc(q: Column, codes: Column, cb: Array[Array[Array[Double]]],
      dim: Int): Column =
    bridge.column(PqAdcExpr(bridge.expression(q), bridge.expression(codes),
      flat(cb), dim, cb.length, cb.head.length))

  def pq_lut(q: Column, cb: Array[Array[Array[Double]]], dim: Int): Column =
    bridge.column(PqLutExpr(bridge.expression(q), flat(cb),
      dim, cb.length, cb.head.length))

  def pq_lut_adc(lut: Column, codes: Column,
      cb: Array[Array[Array[Double]]]): Column =
    bridge.column(PqLutAdcExpr(bridge.expression(lut),
      bridge.expression(codes), cb.length, cb.head.length))
}
