package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heavy hitters / frequent items — the telemetry query every curation
  * stack runs over its key columns (top domains, top users, top tokens).
  * Two faces:
  *
  *   - [[exactTopK]]: the exact groupBy-count top-k (one count shuffle on
  *     the key — at 100 TB this is safe exactly when key cardinality is;
  *     the gate face, d30).
  *   - [[spaceSaving]]: the bounded-memory path for when it is not —
  *     per-partition space-saving summaries (Metwally et al.'s stream
  *     algorithm run over each partition iterator; a genuine
  *     `mapPartitions` use: per-partition IMPERATIVE state, the shape the
  *     operator guide reserves it for) unioned into global candidates.
  *
  * Union-of-summaries guarantee (the pigeonhole argument): if a key's
  * global count exceeds totalRows/capacity, then in at least one
  * partition its count exceeds that partition's rows/capacity — space
  * saving guarantees per-partition retention above that bound, so every
  * globally-heavy key appears in the union. Reported `cnt_lower`
  * (observed count minus overestimation error, summed over partitions
  * where the key survived) never exceeds the true count — both
  * properties are spec-asserted against a skewed stream.
  */
object FrequentItems {

  /** Exact top-k keys by count: (key, n), ties broken toward the smaller
    * key. Sort+limit, never a global window. */
  def exactTopK(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)

  /** Bounded-memory frequent-item candidates: per-partition space-saving
    * summaries of `capacity` counters each, unioned and summed. Output:
    * (key, cnt_lower) — `key` keeps the INPUT column's type (string
    * domains, long ids — anything hashable), `cnt_lower` is a lower
    * bound on the true count; every key whose true count exceeds
    * totalRows/capacity is guaranteed present.
    *
    * Eviction is O(log capacity) amortized via a lazily-invalidated
    * min-heap (an increment pushes a fresh entry instead of re-keying
    * the heap; stale entries are skipped at pop time and the heap is
    * rebuilt from the live counters when staleness exceeds 8×capacity),
    * so a high-cardinality partition costs O(rows × log capacity), not
    * the O(rows × capacity) a min-scan per unseen key would. */
  def spaceSaving(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val keyed = df.select(col(keyCol).as("key"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      keyed.schema.head,
      org.apache.spark.sql.types.StructField("lower",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val summaries = keyed.mapPartitions { it =>
      // Metwally et al. space saving: capacity counters; an unseen key
      // replaces the minimum counter and inherits its count as error.
      val cnt = scala.collection.mutable.HashMap.empty[Any, Long]
      val err = scala.collection.mutable.HashMap.empty[Any, Long]
      // min-heap over (count, key) with lazy invalidation: an entry is
      // live iff its count equals the key's current count.
      implicit val ord: Ordering[(Long, Any)] =
        Ordering.by[(Long, Any), Long](_._1).reverse
      var heap = scala.collection.mutable.PriorityQueue.empty[(Long, Any)]
      def popMin(): (Any, Long) = {
        var top = heap.dequeue()
        while (!cnt.get(top._2).contains(top._1)) top = heap.dequeue()
        (top._2, top._1)
      }
      it.foreach { row =>
        val k = row.get(0)
        cnt.get(k) match {
          case Some(c) =>
            cnt(k) = c + 1L
            heap.enqueue((c + 1L, k))
          case None if cnt.size < capacity =>
            cnt(k) = 1L; err(k) = 0L
            heap.enqueue((1L, k))
          case None =>
            val (mk, mv) = popMin()
            cnt.remove(mk); err.remove(mk)
            cnt(k) = mv + 1L
            err(k) = mv
            heap.enqueue((mv + 1L, k))
        }
        if (heap.size > 8 * capacity)
          heap = scala.collection.mutable.PriorityQueue.from(
            cnt.iterator.map { case (key, c) => (c, key) })
      }
      cnt.iterator.map { case (k, c) =>
        org.apache.spark.sql.Row(k, c - err(k))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    summaries.groupBy("key").agg(sum("lower").as("cnt_lower"))
  }
}
