package graft.sources

import org.apache.spark.sql.DataFrame

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

  /** Write `df` as a bucketed+sorted managed table (in-catalog parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner elides both
    * exchanges when bucket specs line up. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
