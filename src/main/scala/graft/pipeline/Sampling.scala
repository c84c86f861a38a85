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

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row draws a pseudo-uniform u from its key's
    * sha bucket ((b+1)/10000 ∈ (0, 1]) and competes on the priority
    * ln(u)/w — the top-k priorities are a weighted sample where a row's
    * inclusion probability is proportional to its weight. Same
    * determinism contract as everything here: membership is a pure
    * function of (seed, key, weight), so re-runs, repartitions, and
    * corpus growth never reshuffle who was drawn.
    *
    * Cross-engine exactness: u is an exact-integer division (identical
    * IEEE result on both engines — no decimal-literal parsing
    * involved); ln is within 1 ulp each side, so the priority is
    * rounded to 9 dp and ties break on the key (the e5 ranking
    * contract). Weights must be ≥ 1 (ln(u) ≤ 0 shrinks toward 0 as w
    * grows; w = 0 would divide by zero).
    *
    * 100 TB shape: one narrow projection computes priorities off the
    * scan, then a global top-k — Spark's TakeOrderedAndProject, a
    * per-partition heap + driver merge of k rows, never a full sort. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (shaBucket(col(keyCol), seed) + lit(1)).cast("double") /
      lit(10000.0)
    df.withColumn("pri", round(log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("pri").desc, col(keyCol))
      .limit(k)
  }

  /** Deterministic DOWN-sample: keep ~`fraction` of rows, chosen by key
    * hash — same rows every run. Shuffle-free filter. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    df.filter(hashBucket(col(keyCol), seed) <
      math.round(fraction * Buckets))

  /** Stratified exact sample: per stratum, keep ceil(fraction × |stratum|)
    * rows, selected in (hash-bucket, key) order — deterministic, stable
    * across runs and layouts. `bucketFn` picks the hash family:
    * [[hashBucket]] (xxhash64, fastest) or [[shaBucket]] (cross-engine-
    * replayable, oracle-checkable).
    *
    * Two-phase EXACT selection, no per-stratum full sort (a hot stratum
    * at 100 TB must not become one window task):
    *
    *   1. counting pass (column-pruned to stratum + key): rows per
    *      (stratum, bucket) — a hash aggregate with map-side partials,
    *      ≤ 10000 rows per stratum however large the stratum. Prefix
    *      sums over the HISTOGRAM find each stratum's threshold bucket
    *      `_tb` (all rows in buckets < `_tb` are in) and the remainder
    *      `_take` that bucket `_tb` contributes.
    *   2. selection pass: rank rows within their (stratum, BUCKET) group
    *      — ~1/10000 of a stratum per window partition, so parallelism
    *      is strata × buckets and no task ever sorts a whole stratum —
    *      broadcast-join the one threshold row per stratum, and keep
    *      `_bkt < _tb OR (_bkt = _tb AND _rk <= _take)` with one filter.
    *
    * The selected set is IDENTICAL to ranking the whole stratum by
    * (bucket, key) and keeping the first ceil(n·fraction) rows (the
    * [[stratifiedBySort]] reference form; equality is spec-asserted, and
    * the d12 oracle replays exactly that ranking). Null keys hash to a
    * null bucket, which sorts first in the reference form — mapped to
    * bucket -1 here to match. Reserved column names `_s _bkt _bn _tb
    * _take _rk` must not collide with `df`'s.
    */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
      fraction: Double, seed: Long = 42L,
      bucketFn: (Column, Long) => Column = hashBucket): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    selectByQuota(df, stratumCol, keyCol,
      (_, total) => ceil(total * fraction), seed, bucketFn)
  }

  /** Per-stratum QUOTA cap: keep at most `maxPerStratum` rows per stratum
    * (all of them when the stratum is smaller), selected in (hash-bucket,
    * key) order — the "domain cap" curation op for crawl corpora, where a
    * handful of giant sources would otherwise dominate the training mix.
    * Same two-phase histogram selection as [[stratified]] (absolute quota
    * instead of a fraction), so a 10-billion-row source costs a bounded
    * histogram, never a single-task sort. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
      maxPerStratum: Long, seed: Long = 42L,
      bucketFn: (Column, Long) => Column = hashBucket): DataFrame = {
    require(maxPerStratum >= 0, "maxPerStratum must be >= 0")
    selectByQuota(df, stratumCol, keyCol,
      (_, total) => least(lit(maxPerStratum), total), seed, bucketFn)
  }

  /** Weighted BUDGET selection: keep the prefix of `df` in
    * (score, hash-bucket, key) order whose cumulative `weightCol` stays
    * within `budget` — "take the best-scoring documents until the token
    * budget is spent", the final assembly step of a training mix.
    *
    * Two-phase, like [[stratified]]: a global sort by score at 100 TB is
    * off the table, so phase 1 aggregates weight per (score, bucket)
    * group — a bounded histogram (distinct scores × 10000 buckets)
    * whose running sum locates the one threshold group that crosses the
    * budget — and phase 2 ranks rows ONLY inside that group (~1/10000
    * of one score class) to spend the remainder. Selected set is
    * IDENTICAL to the single-window reference form (cum-sum over the
    * full (score, bucket, key) order, kept while ≤ budget — a prefix,
    * since weights are non-negative); the d22 oracle replays exactly
    * that. Scores should be low-cardinality (integer per-mille grades
    * like [[Curation.repetitionStats]]'s — ≤ ~1001 values); weights
    * must be non-negative. Reserved column names `_bkt _w _cum _ts _tb
    * _rem _cw` must not collide with `df`'s. */
  def weightBudget(df: DataFrame, scoreCol: String, keyCol: String,
      weightCol: String, budget: Long, seed: Long = 42L,
      bucketFn: (Column, Long) => Column = hashBucket): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val tagged = df.withColumn("_bkt",
      coalesce(bucketFn(col(keyCol), seed), lit(-1L)))
    // Phase 1 — weight per (score, bucket) group; ONE ordered window,
    // but over histogram rows only. The first group whose running sum
    // exceeds the budget is the threshold group; everything before it is
    // fully in, and `_rem` is the weight it may still spend.
    val hist = tagged.groupBy(col(scoreCol).as("_ts"), col("_bkt").as("_tb"))
      .agg(sum(col(weightCol)).as("_w"))
    val wCum = Window.orderBy(col("_ts"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist
      .withColumn("_cum", sum(col("_w")).over(wCum))
      .filter(col("_cum") > budget)
      .orderBy(col("_ts"), col("_tb"))
      .limit(1)
      .select(col("_ts"), col("_tb"),
        (lit(budget) - col("_cum") + col("_w")).as("_rem"))
    // Phase 2 — every row sees the (at most one) threshold row via an
    // always-true left broadcast join; no threshold row means the whole
    // input fits the budget. The cum-sum window partitions by
    // (score, bucket) — tiny partitions, the same boundedness as
    // [[stratified]]'s phase 2 — and only the threshold group's values
    // are consulted by the filter. Scores must be non-null (null
    // ordering differs across engines).
    val wIn = Window.partitionBy(col(scoreCol), col("_bkt"))
      .orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.join(broadcast(thr), lit(true), "left")
      .withColumn("_cw", sum(col(weightCol)).over(wIn))
      .filter(col("_ts").isNull ||
        col(scoreCol) < col("_ts") ||
        (col(scoreCol) === col("_ts") && col("_bkt") < col("_tb")) ||
        (col(scoreCol) === col("_ts") && col("_bkt") === col("_tb") &&
          col("_cw") <= col("_rem")))
      .drop("_bkt", "_ts", "_tb", "_rem", "_cw")
  }

  /** Per-stratum quota TABLE: each stratum keeps at most its own quota
    * (strata absent from the map keep nothing) — the primitive behind
    * weighted corpus mixing, where "30% web / 50% code / 20% books" is
    * expressed as absolute per-source document budgets. The quota map is
    * a driver-side config (mix specs are small — hundreds of named
    * sources); it compiles to a CASE chain evaluated on histogram rows
    * only, never per document row. */
  def stratifiedQuotas(df: DataFrame, stratumCol: String, keyCol: String,
      quotas: Map[String, Long], seed: Long = 42L,
      bucketFn: (Column, Long) => Column = hashBucket): DataFrame = {
    require(quotas.values.forall(_ >= 0), "quotas must be >= 0")
    val quotaExpr = (s: Column) => quotas.foldLeft(lit(0L)) {
      case (acc, (name, q)) => when(s === name, q).otherwise(acc)
    }
    selectByQuota(df, stratumCol, keyCol,
      (s, total) => least(quotaExpr(s), total), seed, bucketFn)
  }

  /** Shared two-phase selection body: `quotaOf` maps a stratum's value
    * and total row count to the number of rows to keep from its
    * (bucket, key) ranking. */
  private def selectByQuota(df: DataFrame, stratumCol: String,
      keyCol: String, quotaOf: (Column, Column) => Column, seed: Long,
      bucketFn: (Column, Long) => Column): DataFrame = {
    val tagged = df.withColumn("_bkt",
      coalesce(bucketFn(col(keyCol), seed), lit(-1L)))
    // Phase 1 — per-stratum bucket histogram (bounded: ≤ Buckets+1 rows
    // per stratum; the scan prunes to the stratum/key columns), prefix
    // sums over it, threshold bucket + remainder. The windows here run
    // over histogram rows only.
    val hist = tagged.groupBy(col(stratumCol).as("_s"), col("_bkt"))
      .agg(count(lit(1)).as("_bn"))
    val wAll = Window.partitionBy(col("_s"))
    val wCum = wAll.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist
      .withColumn("_cum", sum(col("_bn")).over(wCum))
      .withColumn("_quota", quotaOf(col("_s"), sum(col("_bn")).over(wAll)))
      .filter(col("_cum") >= col("_quota"))
      .withColumn("_rn", row_number().over(wAll.orderBy(col("_bkt"))))
      .filter(col("_rn") === 1)
      .select(col("_s"), col("_bkt").as("_tb"),
        (col("_quota") - col("_cum") + col("_bn")).as("_take"))
    // Phase 2 — rank within fine-grained (stratum, bucket) groups, then
    // one null-safe broadcastable join of the per-stratum threshold row
    // and one filter. No union, no re-scan per branch.
    val ranked = tagged.withColumn("_rk", row_number().over(
      Window.partitionBy(col(stratumCol), col("_bkt")).orderBy(col(keyCol))))
    ranked.join(thr, col(stratumCol) <=> col("_s"))
      .filter(col("_bkt") < col("_tb") ||
        (col("_bkt") === col("_tb") && col("_rk") <= col("_take")))
      .drop("_s", "_bkt", "_tb", "_take", "_rk")
  }

  /** Reference form of [[stratified]]: rank the WHOLE stratum by
    * (bucket, key) through one window. Identical selected set; kept as
    * the readable specification and for the equality spec — at scale a
    * hot stratum makes this a single-task sort, so production code uses
    * the two-phase form. */
  def stratifiedBySort(df: DataFrame, stratumCol: String, keyCol: String,
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
