package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.SparkSpec

/** The two-level IVF kernel vs an independent Scala reference of the same
  * two-stage search, plus exhaustive-equivalence when every super is
  * probed, layout integrity of the build, and interpreted/codegen parity. */
class Ivf2CellsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(11)
  private val dim = 8
  private val nlist = 9 // nsuper = 3
  private val cents: Array[Array[Double]] =
    Array.fill(nlist)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  private val labels: Array[Long] =
    Array(70L, 20L, 90L, 10L, 50L, 30L, 80L, 60L, 40L)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Independent two-stage reference: same super choice rule as build(). */
  private def reference(v: Array[Double], superProbe: Int,
      nprobe: Int): Seq[Long] = {
    val nsuper = math.ceil(math.sqrt(nlist)).toInt
    val supers = cents.take(nsuper)
    val home = cents.map { cv =>
      supers.indices.maxBy(sj => (cos(cv, supers(sj)), sj))
    }
    val topSupers = supers.indices
      .sortBy(sj => (-cos(v, supers(sj)), -sj)).take(superProbe)
    val candidates = cents.indices.filter(ci => topSupers.contains(home(ci)))
    candidates.sortBy(ci => (-cos(v, cents(ci)), -labels(ci)))
      .take(nprobe).map(labels(_))
  }

  private def viaDf(vecs: Seq[Seq[Double]], superProbe: Int,
      nprobe: Int): Seq[Seq[Long]] = {
    import spark.implicits._
    vecs.toDF("v").select(
        Ivf2Cells.ivf2_cells(col("v"), cents, labels, superProbe, nprobe)
          .as("c"))
      .as[Seq[Long]].collect().toSeq
  }

  test("build: offsets partition children, labels/vectors stay aligned") {
    val (sc, cc, cl, of) = Ivf2Cells.build(cents, labels)
    assert(sc.length === 3 * dim)
    assert(cc.length === nlist * dim && cl.length === nlist)
    assert(of.head === 0 && of.last === nlist)
    assert(cl.sorted.toSeq === labels.sorted.toSeq)
    // every child vector still sits next to its own label
    val byLabel = labels.zip(cents).toMap
    cl.zipWithIndex.foreach { case (label, idx) =>
      assert(cc.slice(idx * dim, (idx + 1) * dim).toSeq ===
        byLabel(label).toSeq)
    }
  }

  test("two-stage ranking matches the Scala reference") {
    val vecs = Seq.fill(40)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    for (sp <- Seq(1, 2); np <- Seq(1, 3)) {
      viaDf(vecs, sp, np).zip(vecs).foreach { case (got, v) =>
        assert(got == reference(v.toArray, sp, np),
          s"superProbe=$sp nprobe=$np for $v")
      }
    }
  }

  test("probing every super ≡ the flat kernel (exhaustive equivalence)") {
    import spark.implicits._
    val vecs = Seq.fill(30)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val rows = vecs.toDF("v").select(
      Ivf2Cells.ivf2_cells(col("v"), cents, labels, 3, 4).as("two"),
      IvfCells.ivf_cells(col("v"), cents, labels, 4).as("flat"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (two, flat) => assert(two == flat) }
  }

  test("interpreted (eval) path equals codegen path") {
    val vecs = Seq.fill(10)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val viaCodegen = viaDf(vecs, 2, 3)
    val (sc, cc, cl, of) = Ivf2Cells.build(cents, labels)
    val expr = Ivf2CellsExpr(
      BoundReference(0, ArrayType(DoubleType, containsNull = false),
        nullable = false),
      sc, cc, cl, of, dim, 2, 3)
    val viaEval = vecs.map { v =>
      expr.eval(InternalRow(ArrayData.toArrayData(v.toArray)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
    }
    assert(viaCodegen == viaEval)
  }
}
