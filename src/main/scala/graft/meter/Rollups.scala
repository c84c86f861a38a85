package graft.meter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-resolution rollup maintenance (reference: core.clj:87-153, DDL at
  * setup_and_notes.txt:16-44). The reference maintains minute/hour/day tables
  * via non-idempotent Cassandra counter increments; we instead re-aggregate
  * with a deterministic `sum` — idempotent, replayable, and identical totals
  * under exactly-once delivery (SURVEY §7.3).
  *
  * Scale design: rollups chain coarser-from-finer (minute from second, hour
  * from minute, day from hour) exploiting sum associativity — the same trick
  * the reference plays with counters. Each step is a partial+final hash
  * aggregate; input to each step is already tiny relative to raw, so the
  * only full-size shuffle is second→minute. `joules` is LongType because a
  * day of 59 J/s sums to ~5.1M and coarser grains would overflow Int
  * (SURVEY §7.4).
  */
object Rollups {

  /** Upsert/last-write-wins semantics of the Cassandra data model
    * (setup_and_notes.txt:20): dedup on the primary key before aggregating. */
  def dedupe(second: DataFrame): DataFrame =
    second.dropDuplicates("said", "datetime")

  /** One grain step: truncate the clustering key, sum joules. */
  def atGrain(finer: DataFrame, grain: String): DataFrame =
    finer.groupBy(col("said"), date_trunc(grain, col("datetime")).as("datetime"))
      .agg(sum(col("joules").cast("long")).as("joules"))

  def minute(second: DataFrame): DataFrame = atGrain(second, "minute")
  def hour(minute: DataFrame): DataFrame = atGrain(minute, "hour")
  def day(hour: DataFrame): DataFrame = atGrain(hour, "day")

  /** All four grains from the per-second table, chained coarse-from-fine. */
  def all(second: DataFrame): Map[String, DataFrame] = {
    val m = minute(second)
    val h = hour(m)
    val d = day(h)
    Map("second" -> second, "minute" -> m, "hour" -> h, "day" -> d)
  }

  /** Raw-table writer layout for Q1-style reads ("all raw values for a meter
    * in a time period", setup_and_notes.txt:46): partition by date so time
    * predicates prune partitions, bucket-like said subdirs via `said % n`.
    * zstd because the 15k-float arrays dominate bytes (SURVEY §4.3). */
  def writeRaw(raw: DataFrame, path: String, saidBuckets: Int = 16): Unit =
    raw
      .withColumn("dt", to_date(col("datetime")))
      .withColumn("said_bucket", pmod(col("said"), lit(saidBuckets)))
      .write
      .partitionBy("dt", "said_bucket")
      .option("compression", "zstd")
      .mode("overwrite")
      .parquet(path)

  /** Rollup tables are tiny (1 row/meter/bucket) — coalesce before write. */
  def writeRollup(rollup: DataFrame, path: String): Unit =
    rollup.coalesce(1).write.mode("overwrite").parquet(path)
}
