package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the runtime-filter pattern for joins
  * whose small side is too big to broadcast as a hash relation but whose
  * KEY SET compresses into a few megabytes of bloom bits.
  *
  * At 100 TB the dominant cost of `fact ⋈ dim` is shuffling the fact
  * side; when the join is selective, most shuffled fact rows die in the
  * join anyway. Building a bloom filter over the dim keys (one small
  * aggregate job), embedding it as a plan literal, and filtering the fact
  * scan through `might_contain` BEFORE the exchange drops those rows at
  * the map side for the price of one hash per row — same idea as Spark's
  * own `spark.sql.optimizer.runtime.bloomFilter` injection, exposed here
  * as an explicit operator so pipelines can build the filter once and
  * reuse it across many queries (the injected form rebuilds per query and
  * only fires under cost heuristics).
  *
  * False positives only ever ADD back rows the join would drop — results
  * are exactly join-invariant (asserted in BloomPruneSpec).
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the engine-internal runtime-filter expressions; `might_contain`
  * requires a CONSTANT filter argument, which the literal embedding
  * satisfies). Key hashing is xxhash64 on both sides — the same family
  * the engine's dedup stack uses.
  */
object BloomPrune {

  /** Build the bloom bits over `keyDf.keyCol` — one aggregate job whose
    * result is a single binary cell (~numBits/8 bytes; 8M bits ≈ 1 MB,
    * the same order as a broadcasted dimension's task binary). */
  def keyFilter(keyDf: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long = 8L * 1024 * 1024): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      bridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    keyDf.select(bridge.column(agg).as("bf")).head.getAs[Array[Byte]]("bf")
  }

  /** Filter `df` to rows whose key MIGHT appear in the bloom bits —
    * a map-side-only projection+filter (no shuffle, no join). */
  def pruned(df: DataFrame, keyCol: String, bloom: Array[Byte]): DataFrame =
    df.filter(bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      bridge.expression(xxhash64(col(keyCol))))))

  /** `big ⋈ small` with the big side pre-pruned through a bloom filter of
    * the small side's keys. Exactly equal to the plain inner join. */
  def prunedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long): DataFrame = {
    val bloom = keyFilter(small, smallKey, expectedItems)
    pruned(big, bigKey, bloom)
      .join(small, col(bigKey) === col(smallKey))
  }
}
