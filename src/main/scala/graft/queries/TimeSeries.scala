package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Time-series operators over the `events` fixture: regular-grid gap
  * filling with forward fill, and gap-based batch sessionization (the
  * batch face of the streaming session windows in
  * [[graft.streaming.StreamQueries]] s4).
  *
  * Both are per-entity window patterns: one shuffle keyed on the entity
  * id, then order-by-time work inside each partition. At 100 TB the
  * entity key (user, device, meter) is the natural partitioner — state
  * per entity is bounded by its own history span, and no operator here
  * ever materializes a cross-entity structure.
  */
object TimeSeries {

  /** Regular hourly grid per entity with forward fill: aggregate
    * `metric` per (entity, hour), densify each entity's [min, max] hour
    * span, and carry the last observed value across the gaps. Returns
    * (entityCol, hour, filled, was_observed).
    *
    * The grid generation is per-entity `sequence(min, max, 1h)` — its
    * cost is the entity's time span, not the corpus size; the fill is a
    * running `last(ignoreNulls)` over the entity window. The first grid
    * row per entity is its first observed hour, so `filled` is never
    * NULL.
    *
    * 100 TB shape: two shuffles keyed on the entity (pre-agg, then
    * window); the grid explode happens AFTER aggregation, on one row
    * per (entity, hour-span) — never on raw events. */
  def gapFillHourly(events: DataFrame, entityCol: String, tsCol: String,
      metric: Column): DataFrame = {
    val hourly = events
      .groupBy(col(entityCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(metric.as("observed"))
    val grid = hourly.groupBy(col(entityCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col(entityCol),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy(entityCol).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(entityCol, "hour"), "left")
      .select(col(entityCol), col("hour"),
        last(col("observed"), ignoreNulls = true).over(w).as("filled"),
        col("observed").isNotNull.cast("long").as("was_observed"))
  }

  /** Regular hourly grid per entity with LINEAR INTERPOLATION across
    * gaps (the fill for continuous measurements, where forward fill is
    * the fill for step/state signals): missing hours get
    * `prev + (next - prev) * offset / span` between the neighboring
    * observations. The grid spans [first, last] observed hour per
    * entity, so every gap is interior and the interpolation is always
    * defined (span ≥ 2 on interpolated rows — no division by zero).
    *
    * Numeric contract: with an exact integer `metric` (e.g. cents), the
    * interpolation is ONE double division over exact-in-double integers
    * (|next-prev| · offset-hours stays far under 2^53), so the result is
    * reproducible bit-for-bit across engines — the DuckDB oracle replays
    * the same expression tree.
    *
    * 100 TB shape: identical to [[gapFillHourly]] — two entity-keyed
    * shuffles; the backward/forward neighbor scans are two window passes
    * over the same sort order, which Spark executes in one sort. */
  def gapFillInterp(events: DataFrame, entityCol: String, tsCol: String,
      metric: Column): DataFrame = {
    val hourly = events
      .groupBy(col(entityCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(metric.as("observed"))
    val grid = hourly.groupBy(col(entityCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col(entityCol),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val back = Window.partitionBy(entityCol).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(entityCol).orderBy("hour")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val hourOf = (c: Column) => (unix_micros(c) / lit(3600000000L))
      .cast("long")
    grid.join(hourly, Seq(entityCol, "hour"), "left")
      .withColumn("_pv", last(col("observed"), ignoreNulls = true)
        .over(back))
      .withColumn("_ph", last(when(col("observed").isNotNull, col("hour")),
        ignoreNulls = true).over(back))
      .withColumn("_nv", first(col("observed"), ignoreNulls = true)
        .over(fwd))
      .withColumn("_nh", first(when(col("observed").isNotNull, col("hour")),
        ignoreNulls = true).over(fwd))
      .select(col(entityCol), col("hour"),
        when(col("observed").isNotNull, col("observed").cast("double"))
          .otherwise(col("_pv").cast("double") +
            ((col("_nv") - col("_pv")) *
              (hourOf(col("hour")) - hourOf(col("_ph")))).cast("double") /
            (hourOf(col("_nh")) - hourOf(col("_ph"))).cast("double"))
          .as("filled"),
        col("observed").isNotNull.cast("long").as("was_observed"))
  }

  /** SCD type-2 interval construction — the warehouse CDC pattern: a
    * change stream keyed by `keyCols` becomes versioned history rows,
    * each valid from its own timestamp until the key's next change
    * (`valid_to` NULL ⇒ current version). The MERGE-free formulation:
    * one `lead` window per key instead of a self-join or a mutable
    * upsert target, so building 100 TB of history is one key-partitioned
    * shuffle + one ordered pass per key — and it is idempotent (re-runs
    * replace, never double-apply, the same property the rollup sinks
    * rely on).
    *
    * Ties: changes sharing a timestamp within a key order by `tieCol`,
    * so the interval chain is deterministic without trusting arrival
    * order. */
  def scd2Intervals(cdc: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    cdc.select((keyCols ++ Seq(tsCol, tieCol) ++ valueCols).map(col): _*)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(ord))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .drop(tsCol)
  }

  /** Integer-exact EWMA smoothing — the telemetry/monitoring smoother
    * (and the "recurrence" shape window functions cannot express): per
    * entity, per hourly observation x_t,
    *
    *   s_1 = x_1
    *   s_t = s_{t−1} + sign(d)·⌊|d| / 2^shift⌋,   d = x_t − s_{t−1}
    *
    * i.e. exponential smoothing with dyadic α = 2^−shift kept entirely
    * in BIGINT: the step magnitude divides by a POWER OF TWO, so the
    * double division inside `floor` is exact (integers < 2^53 divided
    * by 2^k round to themselves), and the sign/abs split makes
    * truncation direction explicit — no floor-vs-trunc ambiguity
    * between engines on negative deltas. DuckDB replays the recurrence
    * with a recursive CTE and matches bit-for-bit.
    *
    * The recurrence is inherently sequential per entity, so it runs as
    * a sorted-struct fold (`sort_array(collect_list)` + `aggregate` —
    * the d28/d33 pattern): one shuffle keyed on the entity, then a
    * linear in-memory pass per entity. State is the entity's own
    * series; the append-per-step output array makes the fold O(n²) in
    * the entity's OBSERVATION COUNT (not the corpus) — bounded by the
    * retention window in production (a year of hours is 8.8k steps),
    * never by corpus size, and no cross-entity structure ever exists.
    *
    * Returns (entityCol, hour, v, ewma), one row per observed hour. */
  def ewmaSmooth(df: DataFrame, entityCol: String, tsCol: String,
      metric: Column, shift: Int = 2): DataFrame = {
    require(shift >= 1 && shift <= 20,
      s"dyadic alpha wants shift in 1..20, got $shift")
    val pow = (1L << shift).toDouble // exact in double
    val series = df
      .groupBy(col(entityCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(metric.as("v"))
    val elemT = "array<struct<hour:timestamp,v:bigint,s:bigint>>"
    val zero = struct(
      lit(null).cast("long").as("prev"),
      array().cast(elemT).as("out"))
    series
      .groupBy(entityCol)
      .agg(sort_array(collect_list(struct(col("hour"), col("v")))).as("xs"))
      .select(col(entityCol),
        explode(aggregate(col("xs"), zero,
          (acc, x) => {
            val prev = acc.getField("prev")
            val d = x.getField("v") - prev
            val s = when(prev.isNull, x.getField("v"))
              .otherwise(prev +
                when(d < 0, lit(-1L)).otherwise(lit(1L)) *
                  floor(abs(d) / lit(pow)).cast("long"))
            struct(s.as("prev"),
              concat(acc.getField("out"),
                array(struct(x.getField("hour").as("hour"),
                  x.getField("v").as("v"), s.as("s"))).cast(elemT))
                .as("out"))
          },
          acc => acc.getField("out"))).as("pt"))
      .select(col(entityCol), col("pt.hour").as("hour"),
        col("pt.v").as("v"), col("pt.s").as("ewma"))
  }

  /** Gap-based sessionization: events of one entity belong to the same
    * session while consecutive gaps stay within `gapUs` microseconds
    * (the classic web-analytics session definition; the streaming twin
    * is s4's session window). Returns one row per event with its
    * `session_id` (1-based, per entity, in time order).
    *
    * Tie safety: events sharing an exact timestamp have gap 0, so the
    * break flag and the running sum are invariant to their relative
    * order — the output is deterministic without a tiebreak column.
    *
    * 100 TB shape: one shuffle on the entity key, two window passes
    * (lag + running sum) inside each partition, never a self-join. */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
      gapUs: Long): DataFrame = {
    val ord = Window.partitionBy(entityCol).orderBy(tsCol)
    val run = Window.partitionBy(entityCol).orderBy(tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(col(tsCol)), 1).over(ord)
    events
      .withColumn("_brk",
        when(prev.isNull || unix_micros(col(tsCol)) - prev > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_brk")).over(run))
      .drop("_brk")
  }

  /** Ordered-funnel analysis: per entity, the earliest time of stage 1,
    * the earliest stage-2 event STRICTLY AFTER that, the earliest
    * stage-3 event strictly after THAT, and the stage reached (1..3; 0
    * when stage 1 never fired). The "strictly after the previous
    * stage's first completion" semantics is the standard ordered funnel
    * (a purchase before any view does not convert). Returns
    * (id, s1_us, s2_us, s3_us, stage) with BIGINT epoch-µs stage times
    * (NULL where unreached) — µs integers, not timestamps, so two
    * engines compare representation-free.
    *
    * 100 TB shape: three chained conditional min-aggregations, each one
    * narrow (id, ts) shuffle keyed by entity — no per-entity event list
    * is ever collected, no window sorts the full event stream; the
    * stage-k frame is entity-cardinality and joins map-side under AQE
    * once it fits broadcast. */
  def funnel(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.length == 3, s"ordered funnel wants 3 stages, got $stages")
    val ev = events.select(col(entityCol).as("id"),
      unix_micros(col(tsCol)).as("us"), col(typeCol).as("et"))
    val s1 = ev.filter(col("et") === stages.head)
      .groupBy("id").agg(min("us").as("s1_us"))
    val s2 = ev.filter(col("et") === stages(1))
      .join(s1, "id").filter(col("us") > col("s1_us"))
      .groupBy("id").agg(min("us").as("s2_us"))
    val s3 = ev.filter(col("et") === stages(2))
      .join(s2, "id").filter(col("us") > col("s2_us"))
      .groupBy("id").agg(min("us").as("s3_us"))
    ev.select("id").distinct()
      .join(s1, Seq("id"), "left")
      .join(s2, Seq("id"), "left")
      .join(s3, Seq("id"), "left")
      .withColumn("stage",
        when(col("s3_us").isNotNull, 3)
          .when(col("s2_us").isNotNull, 2)
          .when(col("s1_us").isNotNull, 1)
          .otherwise(0))
  }

  /** Cohort retention matrix: users grouped by their first-activity day
    * (the cohort), counted on each later day they act again. Output
    * (cohort_day, day_offset, n_users) — the cohort day as a formatted
    * yyyy-MM-dd string (DATE stringifies differently across engines),
    * the offset in whole days, exact BIGINT user counts.
    *
    * 100 TB shape: activity reduces to distinct (user, day) FIRST, so
    * everything downstream scales with users × active-days, not event
    * volume; the cohort frame is user-cardinality and joins on the same
    * user key the distinct just shuffled on (co-partitioned, broadcast
    * when it fits); the final count is a plain integer groupBy at
    * matrix cardinality. No window ever sorts the event stream, and
    * the distinct (user, day) grain makes count(*) per cell an exact
    * distinct-user count — no count-distinct shuffle needed. */
  def cohortRetention(events: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val act = events.select(col(entityCol).as("id"),
      date_trunc("day", col(tsCol)).cast("date").as("d")).distinct()
    val cohort = act.groupBy("id").agg(min("d").as("d0"))
    act.join(cohort, "id")
      .groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("d"), col("d0")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}

/** Gate queries for [[TimeSeries]]. */
object TimeSeriesQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ---- q46: hourly gap fill + forward fill for a deterministic user
  // subset (id % 50 — grid rows stay bounded at every SF: entities ×
  // span-hours, ~2.2k at sf0.01). The metric is the certified exact
  // pattern for the double `value` column: per-hour sum as
  // DECIMAL(18,2), emitted as cents (BIGINT — identical repr on both
  // gate read paths). The oracle replays grid, join, and IGNORE NULLS
  // running fill. ----
  private def q46(s: SparkSession, dir: String): DataFrame =
    TimeSeries.gapFillHourly(
        events(s, dir).filter(col("user_id") % 50 === 0),
        "user_id", "ts",
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long"))
      .orderBy("user_id", "hour")

  private[graft] val q46Oracle =
    """WITH h AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS observed
      |  FROM events WHERE user_id % 50 = 0
      |  GROUP BY user_id, date_trunc('hour', ts)),
      |s AS (
      |  SELECT user_id, unnest(hs) AS hour FROM (
      |    SELECT user_id,
      |      generate_series(MIN(hour), MAX(hour), INTERVAL 1 HOUR) AS hs
      |    FROM h GROUP BY user_id)),
      |j AS (
      |  SELECT s.user_id, s.hour, h.observed
      |  FROM s LEFT JOIN h USING (user_id, hour))
      |SELECT user_id, hour,
      |  last_value(observed IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
      |  (CASE WHEN observed IS NULL THEN 0 ELSE 1 END)::BIGINT AS was_observed
      |FROM j ORDER BY user_id, hour""".stripMargin

  // ---- q48: same grid, linear interpolation instead of forward fill.
  // The metric is integer cents, so the interpolated double is one
  // division over exact-in-double integers — both engines reproduce it
  // bit-for-bit from the same expression tree (see gapFillInterp's
  // numeric contract). ----
  private def q48(s: SparkSession, dir: String): DataFrame =
    TimeSeries.gapFillInterp(
        events(s, dir).filter(col("user_id") % 50 === 0),
        "user_id", "ts",
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long"))
      .orderBy("user_id", "hour")

  private val q48Oracle =
    """WITH h AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS observed
      |  FROM events WHERE user_id % 50 = 0
      |  GROUP BY user_id, date_trunc('hour', ts)),
      |s AS (
      |  SELECT user_id, unnest(hs) AS hour FROM (
      |    SELECT user_id,
      |      generate_series(MIN(hour), MAX(hour), INTERVAL 1 HOUR) AS hs
      |    FROM h GROUP BY user_id)),
      |j AS (
      |  SELECT s.user_id, s.hour, h.observed
      |  FROM s LEFT JOIN h USING (user_id, hour)),
      |n AS (
      |  SELECT user_id, hour, observed,
      |    last_value(observed IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN observed IS NOT NULL THEN hour END
      |      IGNORE NULLS) OVER wb AS ph,
      |    first_value(observed IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN observed IS NOT NULL THEN hour END
      |      IGNORE NULLS) OVER wf AS nh
      |  FROM j
      |  WINDOW
      |    wb AS (PARTITION BY user_id ORDER BY hour
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY user_id ORDER BY hour
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, hour,
      |  CASE WHEN observed IS NOT NULL THEN observed::DOUBLE
      |    ELSE pv::DOUBLE +
      |      ((nv - pv) * (epoch_us(hour)//3600000000
      |                    - epoch_us(ph)//3600000000))::DOUBLE /
      |      (epoch_us(nh)//3600000000
      |       - epoch_us(ph)//3600000000)::DOUBLE END AS filled,
      |  (CASE WHEN observed IS NULL THEN 0 ELSE 1 END)::BIGINT AS was_observed
      |FROM n ORDER BY user_id, hour""".stripMargin

  // ---- q47: batch sessionization, 12-hour gap (the fixture averages
  // ~10.7h between events per user, so the threshold genuinely splits:
  // ~3.3k sessions over 10k events at sf0.01). Emitted per user so the
  // row count stays at the user count; per-session structure is
  // certified through n_sessions / max_session_events / the exact
  // total in-session microseconds. ----
  private def q47(s: SparkSession, dir: String): DataFrame =
    TimeSeries.sessionize(events(s, dir), "user_id", "ts",
        gapUs = 12L * 3600 * 1000000)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_ev"),
        unix_micros(min(col("ts"))).as("t0"),
        unix_micros(max(col("ts"))).as("t1"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("max_session_events"),
        sum(col("t1") - col("t0")).as("in_session_us"))
      .orderBy("user_id")

  private val q47Oracle =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sid AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g),
      |per AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_ev,
      |    epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) AS t1
      |  FROM sid GROUP BY user_id, session_id)
      |SELECT user_id,
      |  COUNT(*) AS n_sessions,
      |  SUM(n_ev)::BIGINT AS n_events,
      |  MAX(n_ev)::BIGINT AS max_session_events,
      |  SUM(t1 - t0)::BIGINT AS in_session_us
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q50: SCD type-2 history from the events change stream — each
  // (user_id, event_type) key's events become versioned intervals
  // [valid_from, valid_to) with the exact-cents value pattern; ties on
  // ts break by event_id on both sides. The oracle replays the LEAD
  // window verbatim. ----
  private def q50(s: SparkSession, dir: String): DataFrame =
    TimeSeries.scd2Intervals(
        events(s, dir).withColumn("cents",
          (col("value").cast("decimal(18,2)") * 100).cast("long")),
        keyCols = Seq("user_id", "event_type"), tsCol = "ts",
        tieCol = "event_id", valueCols = Seq("cents"))
      .orderBy("user_id", "event_type", "valid_from", "event_id")

  private val q50Oracle =
    """SELECT user_id, event_type, event_id,
      |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |  ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  (CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END)::BIGINT
      |    AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |ORDER BY user_id, event_type, valid_from, event_id""".stripMargin

  // ---- q52: integer-exact EWMA smoothing over the q46 entity subset
  // and exact-cents metric. α = ¼ (shift 2); every smoothed value is a
  // BIGINT by construction, and the oracle replays the per-entity
  // recurrence with a recursive CTE over row-numbered observations —
  // the sign/abs split in both engines pins truncation toward zero on
  // negative deltas (DuckDB's // floors, so it is deliberately NOT
  // used). ----
  private def q52(s: SparkSession, dir: String): DataFrame =
    TimeSeries.ewmaSmooth(
        events(s, dir).filter(col("user_id") % 50 === 0),
        "user_id", "ts",
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long"),
        shift = 2)
      .orderBy("user_id", "hour")

  private val q52Oracle =
    """WITH RECURSIVE h AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY date_trunc('hour', ts)) AS rn
      |  FROM events WHERE user_id % 50 = 0
      |  GROUP BY user_id, date_trunc('hour', ts)),
      |r AS (
      |  SELECT user_id, rn, hour, v, v AS s FROM h WHERE rn = 1
      |  UNION ALL
      |  SELECT h.user_id, h.rn, h.hour, h.v,
      |    r.s + (CASE WHEN h.v - r.s < 0 THEN -1 ELSE 1 END) *
      |      CAST(FLOOR(ABS(h.v - r.s) / 4.0) AS BIGINT)
      |  FROM r JOIN h ON h.user_id = r.user_id AND h.rn = r.rn + 1)
      |SELECT user_id, hour, v, s AS ewma
      |FROM r ORDER BY user_id, hour""".stripMargin

  // ---- q54: ordered funnel view → click → purchase per user. Strict
  // after-the-previous-stage ordering; stage times as BIGINT epoch-µs
  // (representation-free across engines); every user appears with the
  // stage reached, including stage 0. ----
  private def q54(s: SparkSession, dir: String): DataFrame =
    TimeSeries.funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("id")

  private val q54Oracle =
    """WITH ev AS (
      |  SELECT user_id AS id, epoch_us(ts) AS us, event_type AS et
      |  FROM events),
      |s1 AS (SELECT id, MIN(us) AS s1_us FROM ev
      |  WHERE et = 'view' GROUP BY id),
      |s2 AS (SELECT ev.id, MIN(us) AS s2_us FROM ev
      |  JOIN s1 USING (id) WHERE et = 'click' AND us > s1_us GROUP BY ev.id),
      |s3 AS (SELECT ev.id, MIN(us) AS s3_us FROM ev
      |  JOIN s2 USING (id) WHERE et = 'purchase' AND us > s2_us
      |  GROUP BY ev.id)
      |SELECT u.id, s1.s1_us, s2.s2_us, s3.s3_us,
      |  CASE WHEN s3.s3_us IS NOT NULL THEN 3
      |       WHEN s2.s2_us IS NOT NULL THEN 2
      |       WHEN s1.s1_us IS NOT NULL THEN 1 ELSE 0 END AS stage
      |FROM (SELECT DISTINCT id FROM ev) u
      |LEFT JOIN s1 USING (id) LEFT JOIN s2 USING (id)
      |LEFT JOIN s3 USING (id)
      |ORDER BY u.id""".stripMargin

  // ---- q56: cohort retention matrix over the events table. Distinct
  // (user, day) grain first, cohort = per-user min day; day keys emitted
  // as formatted strings (DuckDB DATE stringifies with a time component
  // through pandas), offsets and counts as BIGINT — representation-free
  // on both engines. ----
  private def q56(s: SparkSession, dir: String): DataFrame =
    TimeSeries.cohortRetention(events(s, dir), "user_id", "ts")
      .orderBy("cohort_day", "day_offset")

  private val q56Oracle =
    """WITH act AS (
      |  SELECT DISTINCT user_id AS id, date_trunc('day', ts) AS d
      |  FROM events),
      |cohort AS (SELECT id, MIN(d) AS d0 FROM act GROUP BY id)
      |SELECT strftime(d0, '%Y-%m-%d') AS cohort_day,
      |  date_diff('day', d0, d)::BIGINT AS day_offset,
      |  COUNT(*)::BIGINT AS n_users
      |FROM act JOIN cohort USING (id)
      |GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q54_funnel", q54, Some(q54Oracle)),
    QueryDef("q56_cohort_retention", q56, Some(q56Oracle)),
    QueryDef("q46_gapfill_ffill", q46, Some(q46Oracle)),
    QueryDef("q47_sessionize", q47, Some(q47Oracle)),
    QueryDef("q48_gapfill_interp", q48, Some(q48Oracle)),
    QueryDef("q50_scd2_intervals", q50, Some(q50Oracle)),
    QueryDef("q52_ewma_smooth", q52, Some(q52Oracle)))
}
