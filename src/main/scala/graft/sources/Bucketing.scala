package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table utilities for co-located joins (SURVEY §2b partitioning).
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
  * both sides bucketed (and sorted) by the join key lets Spark plan a
  * shuffle-free sort-merge join: each task reads bucket i of both tables.
  * This is the Parquet-world equivalent of the reference's choice to key
  * every Cassandra table by `(said, datetime)` so related rows co-locate
  * (setup_and_notes.txt:16-44).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (in-catalog parquet).
    *
    * The input is first repartitioned by the bucket key into exactly
    * `numBuckets` partitions. `repartition(n, col)` and the bucket-id
    * assignment use the same function (`HashPartitioning(col, n)
    * .partitionIdExpression`), so every write task holds exactly one
    * bucket's rows → ONE file per bucket instead of (input partitions ×
    * buckets) fragments. That single-file-per-bucket layout is also what
    * lets the planner trust the `sortBy` metadata and elide the join-side
    * Sort, not just the Exchange. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.repartition(numBuckets, col(bucketCol))
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner elides both
    * exchanges when bucket specs line up. */
  def colocatedJoin(spark: SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Same, for differently-named keys (e.g. o_orderkey = l_orderkey):
    * bucket-spec compatibility is positional on the join expressions, so
    * the exchanges still elide. */
  def colocatedJoinOn(spark: SparkSession,
      leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
}
