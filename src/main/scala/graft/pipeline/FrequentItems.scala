package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** One count-min hash row: first 8 hex chars of sha256("cm<i>:key")
    * mod `width` — the same sha-prefix construction as
    * [[Sampling.shaBucket]] with a per-row seed, so a SQL oracle replays
    * every bucket assignment bit-for-bit. */
  private def cmBucket(key: Column, row: Int, width: Int): Column =
    pmod(
      conv(substring(
        sha2(concat(lit(s"cm$row:"), key.cast("string")), 256),
        1, 8), 16, 10).cast("long"),
      lit(width.toLong))

  /** Count-min sketch of `keyCol`: `depth` × `width` counters as rows
    * (row, bucket, cnt). Point estimate = the MINIMUM over the depth
    * rows of the hashed bucket's counter ([[cmsEstimate]]) — never
    * under the true count, over only by hash collisions (expected
    * ≤ totalRows/width per row, and the min takes the least-collided
    * row). The third heavy-hitters face: exact when cardinality allows
    * ([[exactTopK]]), space-saving candidates when it does not
    * ([[spaceSaving]]), and THIS when the query is point lookups over a
    * pre-aggregated summary.
    *
    * 100 TB shape: depth narrow projections of the scan union into ONE
    * count shuffle whose key space is depth × width (a few thousand
    * rows total, regardless of input cardinality) — the sketch is
    * broadcastable by construction, and two sketches of the same shape
    * merge by adding counters (a plain union-groupBy-sum), which is
    * what makes per-partition / per-day sketches roll up exactly. */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape $depth x $width")
    (0 until depth).map { i =>
      df.select(lit(i).as("row"),
        cmBucket(col(keyCol), i, width).as("bucket"))
    }.reduce(_ unionAll _)
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `keys` against a [[cmsSketch]]: (key, est).
    * The sketch side is broadcast (≤ depth × width rows by
    * construction); absent (row, bucket) pairs count 0. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val probes = (0 until depth).map { i =>
      keys.select(col(keyCol).as("key"), lit(i).as("row"),
        cmBucket(col(keyCol), i, width).as("bucket"))
    }.reduce(_ unionAll _)
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

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
