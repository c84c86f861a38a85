package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM contract tests for the bounded top-k buffer backing
  * [[TopKPairsAgg]] — ordering, boundary eviction, and the exact
  * (ord, id) duplicate collapse that lets LSH drop its pre-aggregation
  * distinct(). */
class TopKSpec extends AnyFunSuite {

  private def drain(b: TopKBuf): Seq[(Double, Long)] =
    (0 until b.size).map(i => (b.ords(i), b.ids(i)))

  test("keeps the k smallest (ord, id) pairs in order") {
    val b = new TopKBuf(3)
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (0.5, 4L), (4.0, 5L))
      .foreach { case (o, i) => b.insert(o, i) }
    assert(drain(b) === Seq((0.5, 4L), (1.0, 2L), (3.0, 3L)))
  }

  test("ties order by id ascending") {
    val b = new TopKBuf(3)
    Seq((1.0, 9L), (1.0, 2L), (1.0, 5L), (1.0, 1L))
      .foreach { case (o, i) => b.insert(o, i) }
    assert(drain(b) === Seq((1.0, 1L), (1.0, 2L), (1.0, 5L)))
  }

  test("exact (ord, id) duplicates collapse — multi-bucket emission") {
    val b = new TopKBuf(4)
    Seq((2.0, 7L), (1.0, 3L), (2.0, 7L), (1.0, 3L), (3.0, 8L))
      .foreach { case (o, i) => b.insert(o, i) }
    assert(drain(b) === Seq((1.0, 3L), (2.0, 7L), (3.0, 8L)))
    // a duplicate equal to the k-th element with a full buffer is a no-op
    val full = new TopKBuf(2)
    Seq((1.0, 1L), (2.0, 2L), (2.0, 2L)).foreach { case (o, i) =>
      full.insert(o, i)
    }
    assert(drain(full) === Seq((1.0, 1L), (2.0, 2L)))
  }

  test("same id with a different ord is kept (matches the window face)") {
    val b = new TopKBuf(4)
    Seq((1.0, 7L), (2.0, 7L)).foreach { case (o, i) => b.insert(o, i) }
    assert(drain(b) === Seq((1.0, 7L), (2.0, 7L)))
  }

  test("merge of partial buffers preserves global top-k and dedup") {
    val a = new TopKBuf(3)
    Seq((1.0, 1L), (3.0, 3L), (5.0, 5L)).foreach { case (o, i) => a.insert(o, i) }
    val c = new TopKBuf(3)
    Seq((2.0, 2L), (3.0, 3L), (4.0, 4L)).foreach { case (o, i) => c.insert(o, i) }
    (0 until c.size).foreach(i => a.insert(c.ords(i), c.ids(i)))
    assert(drain(a) === Seq((1.0, 1L), (2.0, 2L), (3.0, 3L)))
  }
}
