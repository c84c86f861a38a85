package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as an AGGREGATE instead of a sort+window —
  * the round-10 fix for the one measured scale defect in the ANN ladder.
  *
  * The measurement (BASELINE.md round-10 ANN decomposition): at 1M
  * vectors × 500 queries the candidate join produces 125M scored pairs
  * in <1 s, while the `row_number` window that consumes them costs
  * ~110-180 s — >99% of the whole marginal query cost — because the
  * WindowGroupLimit plan must first SORT every partition's full
  * candidate slice. Scoring kernels (LUT-ADC vs direct ADC vs cosine)
  * are indistinguishable; the sort is everything.
  *
  * This aggregate keeps a k-bounded insertion-sorted buffer per group
  * instead: each of the n candidate rows pays one compare against the
  * current k-th best (O(1) reject in the common case, O(k) shift on
  * accept), there is no sort of the n rows anywhere in the plan, and
  * partial aggregation means each map task ships at most k rows per
  * group across the shuffle — at 1000 executors the exchange carries
  * executors × queries × k tiny rows, invariant in corpus size. The
  * plan becomes ObjectHashAggregate(partial) → Exchange(q_id) →
  * ObjectHashAggregate(final) → posexplode.
  *
  * Ordering contract: ascending (or descending, `asc = false`) by
  * `ord`, ties broken ascending by `id` — EXACTLY the
  * `Window.orderBy(ord, id)` / `row_number <= k` total order the ANN
  * operators used, so results are row-for-row identical (spec-asserted
  * against the window formulation in PipelineSpec).
  *
  * NOTE: groups-per-task must stay under
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`, or
  * ObjectHashAggregate silently falls back to sort-based aggregation
  * and the sort comes back. `Graft.sessionBuilder` raises it to 65536
  * (buffers are ~16·k bytes, so even 65536 live groups is ~tens of MB). */
case class TopKPairsAgg(ord: Expression, id: Expression, k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {

  require(k >= 1 && k <= 4096, s"top-k wants 1..4096, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      // descending faces negate the key so the buffer logic is one
      // ascending comparator; eval() un-negates
      val key = if (asc) o.asInstanceOf[Double] else -o.asInstanceOf[Double]
      b.insert(key, i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.size) { b.insert(other.ords(i), other.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuf): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      out(i) = InternalRow(if (asc) b.ords(i) else -b.ords(i), b.ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.ords(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuf(k)
    var i = 0
    while (i < n) { b.insert(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(ord = newChildren(0), id = newChildren(1))
}

/** k-bounded insertion-sorted (ord asc, id asc) pair buffer.
  *
  * EXACT (ord, id) duplicates are collapsed on insert: a candidate that
  * reaches the buffer from several paths (LSH multi-bucket emission is
  * the canonical case) occupies one slot, so callers do NOT need a
  * distinct() — and its exchange of the full scored candidate set —
  * before the aggregation. A repeated id with a DIFFERENT ord is kept,
  * matching the row_number-window formulation over non-deduplicated
  * input. */
final class TopKBuf(val k: Int) {
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  private def beats(o: Double, i: Long, j: Int): Boolean =
    o < ords(j) || (o == ords(j) && i < ids(j))

  def insert(o: Double, i: Long): Unit = {
    if (size == k && !beats(o, i, k - 1)) {
      // reject — unless it's not even a new pair: equal to the k-th
      // element means duplicate (beats is strict), which is also a no-op
      return
    }
    var pos = if (size == k) k - 1 else size
    // the insertion scan stops at an equal element (strict beats), so a
    // duplicate is always the immediate left neighbour of the stop point
    var scan = pos
    while (scan > 0 && beats(o, i, scan - 1)) scan -= 1
    if (scan > 0 && ords(scan - 1) == o && ids(scan - 1) == i) return
    if (size < k) { size += 1; pos = size - 1 }
    while (pos > scan) {
      ords(pos) = ords(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    ords(scan) = o; ids(scan) = i
  }
}

object TopK {
  /** `topk_pairs(ord, id, k)`: array of the k (ord, id) pairs with the
    * smallest (`asc = true`, default) or largest (`asc = false`) `ord`,
    * ties ascending by id, in rank order. Compose with `posexplode` for
    * the (rank, id, ord) face. */
  def topk_pairs(ord: Column, id: Column, k: Int,
      asc: Boolean = true): Column =
    bridge.column(TopKPairsAgg(bridge.expression(ord),
      bridge.expression(id), k, asc).toAggregateExpression())
}
