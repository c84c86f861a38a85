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
    * (key, cnt_lower) — a lower bound on the true count; every key whose
    * true count exceeds totalRows/capacity is guaranteed present. */
  def spaceSaving(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val summaries = df.select(col(keyCol).cast("long")).as[Long]
      .mapPartitions { it =>
        // Metwally et al. space saving: capacity counters; an unseen key
        // replaces the minimum counter and inherits its count as error.
        val cnt = scala.collection.mutable.LongMap.empty[Long]
        val err = scala.collection.mutable.LongMap.empty[Long]
        it.foreach { k =>
          if (cnt.contains(k)) cnt(k) += 1L
          else if (cnt.size < capacity) { cnt(k) = 1L; err(k) = 0L }
          else {
            val (mk, mv) = cnt.minBy(_._2)
            cnt.remove(mk); err.remove(mk)
            cnt(k) = mv + 1L
            err(k) = mv
          }
        }
        cnt.iterator.map { case (k, c) => (k, c - err(k)) }
      }
    summaries.toDF("key", "lower")
      .groupBy("key").agg(sum("lower").as("cnt_lower"))
  }
}
