package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `randomSplit` draws per-row randoms at execution time: re-running the
  * job, changing partitioning, or appending data reshuffles rows across
  * splits — poison for train/test hygiene at 100 TB where the corpus is
  * rebuilt incrementally. Everything here is a pure function of row KEYS
  * (xxhash64-bucketed), so membership is reproducible across runs,
  * cluster layouts, and corpus growth: a document keeps its split for
  * life, and adding documents never moves existing ones.
  */
object Sampling {

  private val Buckets = 10000

  /** Key bucket in [0, 10000): stable for a given (seed, key). */
  def hashBucket(key: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), key), lit(Buckets.toLong))

  /** Cross-engine-replayable bucket: first 8 hex chars of
    * sha256("seed:key") parsed as a 32-bit int, mod 10000. Same
    * growth-stable membership property as [[hashBucket]] at ~20× the
    * per-row hash cost — still negligible against reading a document row;
    * choose it when an external system (here: the DuckDB oracle, which has
    * sha256 but not xxhash64) must reproduce the assignment bit-for-bit. */
  def shaBucket(key: Column, seed: Long): Column =
    // concat (null-propagating), NOT concat_ws (null-skipping): a NULL key
    // must yield a NULL bucket → split "rest", matching the oracle's
    // ('seed:' || CAST(key AS VARCHAR)) which is NULL for NULL keys. With
    // concat_ws a NULL key would silently hash the bare seed string and
    // land every null row in a real split. Identical bytes for non-null
    // keys, so existing assignments don't move.
    pmod(
      conv(substring(
        sha2(concat(lit(seed.toString + ":"), key.cast("string")), 256),
        1, 8), 16, 10).cast("long"),
      lit(Buckets.toLong))

  /** Adds a `split` column assigning each row to the first named range of
    * the cumulative fractions (fractions must sum to ≤ 1; any remainder
    * bucket is labeled "rest"). Shuffle-free — a pure projection. */
  def splitByHash(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], seed: Long = 42L,
      bucketFn: (Column, Long) => Column = hashBucket): DataFrame = {
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum <= 1")
    val bucket = bucketFn(col(keyCol), seed)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
    val cases = fractions.zip(bounds.sliding(2).toSeq).foldLeft(
      lit(null).cast("string")) { case (acc, ((name, _), Seq(lo, hi))) =>
      when(bucket >= math.round(lo * Buckets) &&
        bucket < math.round(hi * Buckets), name).otherwise(acc)
    }
    df.withColumn("split", coalesce(cases, lit("rest")))
  }

  /** Deterministic DOWN-sample: keep ~`fraction` of rows, chosen by key
    * hash — same rows every run. Shuffle-free filter. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    df.filter(hashBucket(col(keyCol), seed) <
      math.round(fraction * Buckets))

  /** Stratified exact sample: per stratum, keep ceil(fraction × |stratum|)
    * rows, selected in hash order (deterministic). One shuffle on the
    * stratum key; rank via WindowGroupLimit-eligible row_number.
    * `bucketFn` picks the hash family: [[hashBucket]] (xxhash64, fastest)
    * or [[shaBucket]] (cross-engine-replayable, oracle-checkable). */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
      fraction: Double, seed: Long = 42L,
      bucketFn: (Column, Long) => Column = hashBucket): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(bucketFn(col(keyCol), seed), col(keyCol))
    val counted = df.withColumn("_n",
      count(lit(1)).over(Window.partitionBy(col(stratumCol))))
    counted.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= ceil(col("_n") * fraction))
      .drop("_n", "_rk")
  }
}
