package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2b "custom typed agg"): compensated
  * (Kahan) summation — the exact-energy-metric example from §2.1. The
  * buffer is (sum, compensation); merge preserves the compensation terms,
  * so results are far less order-sensitive than a naive double sum on
  * billion-row inputs.
  *
  * Registered via `functions.udaf` it becomes a Column-level aggregate
  * usable in groupBy/agg like any built-in.
  */
case class KahanBuf(sum: Double, c: Double)

object KahanSum extends Aggregator[Double, KahanBuf, Double] {
  override def zero: KahanBuf = KahanBuf(0.0, 0.0)

  override def reduce(b: KahanBuf, x: Double): KahanBuf = {
    val y = x - b.c
    val t = b.sum + y
    KahanBuf(t, (t - b.sum) - y)
  }

  override def merge(a: KahanBuf, b: KahanBuf): KahanBuf = {
    // Kahan-add the two partial sums and both compensations
    val r1 = reduce(a, b.sum)
    reduce(r1, -b.c)
  }

  override def finish(b: KahanBuf): Double = b.sum
  override def bufferEncoder: Encoder[KahanBuf] = Encoders.product[KahanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
