package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
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
  * against the window formulation in PipelineSpec) — with two
  * documented divergences: (a) NaN ords are DROPPED in update() (a
  * NaN similarity, i.e. a zero-vector cosine, is never a neighbour;
  * the window face would instead sort NaN first under desc), and
  * (b) exact (ord, id) duplicates collapse to one slot (see
  * [[TopKBuf]]) where row_number over duplicate-bearing input keeps
  * both. Callers needing the window's NaN placement or duplicate
  * retention, or non-(double, long) columns, use [[TopKGenAgg]].
  *
  * Types are locked to `ord: DOUBLE`, `id: BIGINT` so the buffer is
  * two primitive arrays (zero boxing on the 125M-candidate hot path);
  * `checkInputDataTypes` rejects anything else at analysis time —
  * [[TopKGenAgg]] is the generic face for other orderable types.
  *
  * NOTE: groups-per-task must stay under
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`, or
  * ObjectHashAggregate silently falls back to sort-based aggregation
  * and the sort comes back. `Graft.sessionBuilder` raises it to 65536
  * (buffers are ~16·k bytes, so even 65536 live groups is ~tens of MB).
  *
  * MEMORY CONTRACT (both this and [[TopKGenAgg]]): bounded-buffer
  * top-k is a SMALL-k tool. Map-side partial aggregation holds
  * groups-per-task × k live entries with NO spill path — the
  * sort-based fallback above triggers on group COUNT, never on bytes
  * (measured: a cap-4096 aggregation over ~3,600 boxed-string-keyed
  * groups OOM'd an 8 GB JVM, BASELINE.md round 11). Operators exposing
  * k must bound the groups × k product or route large k through a
  * spillable window sort (`userCoEdges` is the worked example). */
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

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs wants ord: DOUBLE, got ${ord.dataType.sql} — " +
          "use topk_gen for other orderable types")
    } else if (id.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs wants id: BIGINT, got ${id.dataType.sql} — " +
          "use topk_gen for other orderable types")
    } else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      val d = o.asInstanceOf[Double]
      // NaN ord (zero-vector cosine) is dropped — see ordering contract
      if (!java.lang.Double.isNaN(d)) {
        // descending faces negate the key so the buffer logic is one
        // ascending comparator; eval() un-negates
        b.insert(if (asc) d else -d, i.asInstanceOf[Long])
      }
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

/** Generic-typed bounded per-group top-k — the same k-bounded
  * insertion-buffer shape as [[TopKPairsAgg]] for ANY orderable
  * (`ord`, `id`) column types, at the cost of boxed values and an
  * interpreted comparator per compare.
  *
  * Two seats in the engine:
  *  - deterministic CAP/SAMPLE selection keyed by a hash STRING — e.g.
  *    `userCoEdges`' per-bucket cap (first `cap` members by
  *    `(sha2(id), id)`) and per-cell representative sampling, which a
  *    `row_number` window would pay a full per-bucket sort for; and
  *  - the fallback for public ANN operators called with non-(double,
  *    long) id/score columns, where [[TopKPairsAgg]] now fails at
  *    analysis time by design.
  *
  * Ordering is Spark's own interpreted ordering for the types
  * (UTF8String = binary/ASCII-lexicographic, matching DuckDB's default
  * VARCHAR collation on hex digests); `asc = false` REVERSES the ord
  * comparator rather than negating values, so NaN doubles land exactly
  * where the window face puts them (largest → first under desc).
  * Exact (ord, id) duplicates collapse to one slot, so a preceding
  * `distinct()` — and its full-width shuffle — is unnecessary. */
case class TopKGenAgg(ord: Expression, id: Expression, k: Int,
    asc: Boolean, warnOnDrop: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKGenBuf] {

  require(k >= 1 && k <= 4096, s"top-k wants 1..4096, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", ord.dataType, nullable = false),
      StructField("id", id.dataType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(ord.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_gen ord type ${ord.dataType.sql} is not orderable")
    } else if (!RowOrdering.isOrderable(id.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_gen id type ${id.dataType.sql} is not orderable")
    } else TypeCheckResult.TypeCheckSuccess

  private lazy val ordCmp: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(ord.dataType)
    if (asc) base else base.reverse
  }
  private lazy val idCmp: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(id.dataType)

  override def createAggregationBuffer(): TopKGenBuf =
    new TopKGenBuf(k, ordCmp, idCmp)

  override def update(b: TopKGenBuf, input: InternalRow): TopKGenBuf = {
    val o = ord.eval(input)
    val i = id.eval(input)
    // copy only on (possible) accept — input-backed UTF8Strings etc.
    // are transient, but the common full-buffer reject needs no copy
    if (o != null && i != null && !b.rejectsNoting(o, i)) {
      b.insert(InternalRow.copyValue(o), InternalRow.copyValue(i))
    }
    b
  }

  override def merge(b: TopKGenBuf, other: TopKGenBuf): TopKGenBuf = {
    b.dropped ||= other.dropped
    var i = 0
    while (i < other.size) { b.insert(other.ords(i), other.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKGenBuf): Any = {
    if (warnOnDrop && b.dropped) TopK.warnDropOnce(k)
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) { out(i) = InternalRow(b.ords(i), b.ids(i)); i += 1 }
    new GenericArrayData(out)
  }

  private lazy val pairProj =
    UnsafeProjection.create(Array(ord.dataType, id.dataType))

  override def serialize(b: TopKGenBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.dropped)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      val bytes = pairProj(InternalRow(b.ords(i), b.ids(i))).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKGenBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    b.dropped = in.readBoolean()
    val n = in.readInt()
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      row.pointTo(arr, len)
      b.insert(InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, id.dataType)))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKGenAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKGenAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKGenAgg =
    copy(ord = newChildren(0), id = newChildren(1))
}

/** k-bounded insertion-sorted pair buffer over boxed values with
  * pluggable comparators — [[TopKBuf]]'s logic, generalized. Exact
  * (ord, id) duplicates (comparator-equal) collapse on insert.
  *
  * `dropped` tracks EXACTLY whether the group exceeded k distinct
  * pairs: set when a full buffer rejects a strictly-worse NEW pair
  * (comparator-equal to the k-th is a duplicate, not a drop) or
  * displaces its k-th to admit a better one. Partial-aggregation
  * sound: a pair worse than k pairs in any partial buffer is worse
  * than k pairs overall, so a local drop is a global drop; merge()
  * ORs the flags. [[TopKGenAgg]] surfaces it via `warnOnDrop`. */
final class TopKGenBuf(val k: Int, ordCmp: Ordering[Any],
    idCmp: Ordering[Any]) {
  val ords = new Array[Any](k)
  val ids = new Array[Any](k)
  var size: Int = 0
  var dropped: Boolean = false

  private def cmp(o: Any, i: Any, j: Int): Int = {
    val c = ordCmp.compare(o, ords(j))
    if (c != 0) c else idCmp.compare(i, ids(j))
  }

  /** Full buffer and (o, i) does not beat the current k-th — insert
    * would be a no-op (covers the duplicate-of-last case too) — with a
    * strictly-worse reject recorded as a drop (cmp == 0 is a duplicate
    * of the k-th, not a drop). The ONLY reject predicate: an untracked
    * twin would silently bypass the warnOnDrop accounting. */
  def rejectsNoting(o: Any, i: Any): Boolean = {
    if (size < k) return false
    val c = cmp(o, i, k - 1)
    if (c > 0) dropped = true
    c >= 0
  }

  def insert(o: Any, i: Any): Unit = {
    if (rejectsNoting(o, i)) return
    var pos = if (size == k) k - 1 else size
    // the scan stops at the first element (o, i) does not strictly
    // beat; comparator-equal there means duplicate → no-op
    var scan = pos
    while (scan > 0 && cmp(o, i, scan - 1) < 0) scan -= 1
    if (scan > 0 && cmp(o, i, scan - 1) == 0) return
    if (size < k) { size += 1; pos = size - 1 }
    else dropped = true // the displaced k-th pair leaves the buffer
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
    * the (rank, id, ord) face. Types locked to (DOUBLE, BIGINT) —
    * analysis-time error otherwise; see [[topk_gen]]. */
  def topk_pairs(ord: Column, id: Column, k: Int,
      asc: Boolean = true): Column =
    bridge.column(TopKPairsAgg(bridge.expression(ord),
      bridge.expression(id), k, asc).toAggregateExpression())

  /** [[topk_pairs]] for any orderable (ord, id) column types (boxed,
    * interpreted comparator — use [[topk_pairs]] on (DOUBLE, BIGINT)
    * hot paths). `warnOnDrop = true` logs ONCE per JVM when any group
    * exceeds k distinct pairs (exact, not heuristic — see
    * [[TopKGenBuf]]); meant for CAP/SAMPLE callers like
    * `Graph.userCoEdges`, where a bite silently trims the result. A
    * ranking top-k drops by design — leave it off there. */
  def topk_gen(ord: Column, id: Column, k: Int,
      asc: Boolean = true, warnOnDrop: Boolean = false): Column =
    bridge.column(TopKGenAgg(bridge.expression(ord),
      bridge.expression(id), k, asc, warnOnDrop).toAggregateExpression())

  private val dropWarned = new java.util.concurrent.atomic.AtomicBoolean

  /** Once-per-JVM executor-side log for `warnOnDrop` buffers: the cap
    * bit somewhere, so the caller's edge/member set is a deterministic
    * sample, not the full bucket contents. */
  private[functions] def warnDropOnce(k: Int): Unit =
    if (dropWarned.compareAndSet(false, true)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"topk_gen(k=$k, warnOnDrop): at least one group exceeded k " +
          "distinct pairs — members beyond the deterministic top-k were " +
          "dropped (cap bite; see the calling operator's cap contract)")
    }
}
