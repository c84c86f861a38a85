package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time-series operators: hourly gap fill with forward fill, and
  * gap-based batch sessionization. */
class TimeSeriesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillHourly: dense grid per entity, forward fill across gaps") {
    import spark.implicits._
    val ev = Seq(
      // user 1: observations at hours 00 and 03 → grid 00..03, hours
      // 01/02 filled from hour 00
      (1L, ts("2024-01-01 00:10:00"), 5L),
      (1L, ts("2024-01-01 00:40:00"), 7L),
      (1L, ts("2024-01-01 03:05:00"), 2L),
      // user 2: a single hour → a one-row grid
      (2L, ts("2024-01-02 10:30:00"), 9L)).toDF("user_id", "ts", "v")
    val out = TimeSeries.gapFillHourly(ev, "user_id", "ts",
        sum(col("v")).cast("long"))
      .orderBy("user_id", "hour").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01 00:00:00.0", 12L, 1L),
      (1L, "2024-01-01 01:00:00.0", 12L, 0L),
      (1L, "2024-01-01 02:00:00.0", 12L, 0L),
      (1L, "2024-01-01 03:00:00.0", 2L, 1L),
      (2L, "2024-01-02 10:00:00.0", 9L, 1L)))
  }

  test("gapFillHourly: grid is contiguous and filled is never null " +
      "on fixture data") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val out = TimeSeries.gapFillHourly(ev, "user_id", "ts",
      count(lit(1)).cast("long"))
    assert(out.filter(col("filled").isNull).count() === 0)
    // per user: rows == span hours + 1 (dense grid)
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((unix_micros(max(col("hour"))) - unix_micros(min(col("hour"))))
          / lit(3600000000L) + 1).cast("long").as("expect"))
      .filter(col("n") =!= col("expect"))
    assert(bad.count() === 0)
  }

  test("gapFillInterp: hand-computed linear interpolation across a gap") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 10 at hour 00, 40 at hour 03 → hours 01/02 interpolate
      // to 20.0 and 30.0; a descending leg 40 → 20 over two hours → 30.0
      (1L, ts("2024-01-01 00:30:00"), 10L),
      (1L, ts("2024-01-01 03:30:00"), 40L),
      (1L, ts("2024-01-01 05:30:00"), 20L)).toDF("user_id", "ts", "v")
    val out = TimeSeries.gapFillInterp(ev, "user_id", "ts",
        sum(col("v")).cast("long"))
      .orderBy("hour").collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 10.0, 1L),
      ("2024-01-01 01:00:00.0", 20.0, 0L),
      ("2024-01-01 02:00:00.0", 30.0, 0L),
      ("2024-01-01 03:00:00.0", 40.0, 1L),
      ("2024-01-01 04:00:00.0", 30.0, 0L),
      ("2024-01-01 05:00:00.0", 20.0, 1L)))
  }

  test("sessionize: hand-computed session boundaries, gap inclusive/" +
      "exclusive contract") {
    import spark.implicits._
    val gapUs = 3600L * 1000000 // 1 hour
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 01:00:00")), // exactly the gap → same session
      (1L, ts("2024-01-01 02:00:01")), // 1s over → new session
      (1L, ts("2024-01-01 02:30:00")),
      (2L, ts("2024-01-01 00:00:00"))).toDF("user_id", "ts")
    val out = TimeSeries.sessionize(ev, "user_id", "ts", gapUs)
      .orderBy("user_id", "ts")
      .select("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("sessionize: session ids are 1..n_sessions per entity, events " +
      "conserved on fixture data") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val out = TimeSeries.sessionize(ev, "user_id", "ts",
      gapUs = 12L * 3600 * 1000000)
    assert(out.count() === ev.count())
    val bad = out.groupBy("user_id")
      .agg(min(col("session_id")).as("lo"),
        max(col("session_id")).as("hi"),
        countDistinct(col("session_id")).as("n"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("scd2Intervals: contiguous per-key chains, exactly one current version") {
    import spark.implicits._
    val cdc = Seq(
      (1L, "plan", ts("2024-01-01 00:00:00"), 1L, 10L),
      (1L, "plan", ts("2024-02-01 00:00:00"), 2L, 20L),
      (1L, "plan", ts("2024-02-01 00:00:00"), 3L, 30L), // same-ts tie
      (1L, "addr", ts("2024-01-15 00:00:00"), 4L, 99L), // other key
      (2L, "plan", ts("2024-03-01 00:00:00"), 5L, 7L)   // single version
    ).toDF("user_id", "event_type", "ts", "event_id", "v")
    val out = TimeSeries.scd2Intervals(cdc, Seq("user_id", "event_type"),
        "ts", "event_id", Seq("v"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Timestamp]("valid_to")),
          r.getAs[Long]("is_current"))).toMap
    // chain: v1 until the feb change, tie orders v2 before v3, v3 current
    assert(out(1L) === ((Some(ts("2024-02-01 00:00:00")), 0L)))
    assert(out(2L) === ((Some(ts("2024-02-01 00:00:00")), 0L)))
    assert(out(3L) === ((None, 1L)))
    // other keys untouched by user 1's plan history
    assert(out(4L) === ((None, 1L)) && out(5L) === ((None, 1L)))
    // invariant: exactly one current row per key
    val cur = TimeSeries.scd2Intervals(cdc, Seq("user_id", "event_type"),
        "ts", "event_id", Seq("v"))
      .groupBy("user_id", "event_type")
      .agg(sum("is_current").as("n_cur")).collect()
    assert(cur.forall(_.getAs[Long]("n_cur") == 1L))
  }

  test("ewmaSmooth: hand-computed recurrence, truncation toward zero " +
      "on a negative delta") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:05:00"), 100L),
      (1L, ts("2024-01-01 01:05:00"), 200L), // d=+100 → s=100+25=125
      (1L, ts("2024-01-01 02:05:00"), 22L),  // d=-103 → s=125-25=100
      (1L, ts("2024-01-01 03:05:00"), 99L),  // d=-1   → s=100-0=100
      (2L, ts("2024-01-01 00:05:00"), 7L))   // singleton: s=x1
      .toDF("user_id", "ts", "v")
    val out = TimeSeries.ewmaSmooth(ev, "user_id", "ts",
        sum(col("v")).cast("long"), shift = 2)
      .orderBy("user_id", "hour")
      .select("user_id", "v", "ewma")
      .as[(Long, Long, Long)].collect().toSeq
    // -103/4 floors to -26 but truncates to -25: the sign/abs contract.
    assert(out === Seq(
      (1L, 100L, 100L), (1L, 200L, 125L), (1L, 22L, 100L),
      (1L, 99L, 100L), (2L, 7L, 7L)))
  }

  test("ewmaSmooth: two observations in one hour aggregate before " +
      "smoothing; output has one row per observed hour") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:05:00"), 30L),
      (1L, ts("2024-01-01 00:45:00"), 70L), // same hour: v=100
      (1L, ts("2024-01-01 05:05:00"), 180L)) // gap hours absent
      .toDF("user_id", "ts", "v")
    val out = TimeSeries.ewmaSmooth(ev, "user_id", "ts",
        sum(col("v")).cast("long"), shift = 2)
      .orderBy("hour")
      .select("v", "ewma").as[(Long, Long)].collect().toSeq
    assert(out === Seq((100L, 100L), (180L, 120L)))
  }

  test("funnel: strict ordering — out-of-order stages do not convert") {
    import spark.implicits._
    val us = (m: Int) => ts(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: full funnel in order
      (1L, us(1), "view"), (1L, us(2), "click"), (1L, us(3), "purchase"),
      // user 2: purchase BEFORE click → stage 2 only
      (2L, us(1), "view"), (2L, us(2), "purchase"), (2L, us(3), "click"),
      // user 3: click with no view → stage 0
      (3L, us(1), "click"), (3L, us(2), "purchase"),
      // user 4: simultaneous view+click (strict > rejects) then a later
      // click → stages use the LATER click
      (4L, us(5), "view"), (4L, us(5), "click"), (4L, us(9), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = TimeSeries.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    def u(m: Int): Long = us(m).getTime * 1000L
    assert(out.toSeq === Seq(
      (1L, u(1), u(2), u(3), 3),
      (2L, u(1), u(3), -1L, 2),
      (3L, -1L, -1L, -1L, 0),
      (4L, u(5), u(9), -1L, 2)))
  }

  test("cohortRetention: hand-computed matrix — cohorts split by first " +
      "day, gaps keep later offsets, multiple same-day events count once") {
    import spark.implicits._
    val ev = Seq(
      // users 1,2 first seen Jan 1 (cohort A); user 1 returns on Jan 2
      // and (after a gap) Jan 4; user 2 never returns. Two events for
      // user 1 on Jan 1 must count once.
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 17:00:00")),
      (1L, ts("2024-01-02 08:00:00")), (1L, ts("2024-01-04 23:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      // user 3 first seen Jan 2 (cohort B), returns Jan 3
      (3L, ts("2024-01-02 10:00:00")), (3L, ts("2024-01-03 10:00:00")))
      .toDF("user_id", "ts")
    val out = TimeSeries.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 0L, 2L),   // both cohort-A users on day 0
      ("2024-01-01", 1L, 1L),   // only user 1 returns day 1
      ("2024-01-01", 3L, 1L),   // ...and day 3 (day 2 absent, no row)
      ("2024-01-02", 0L, 1L),
      ("2024-01-02", 1L, 1L)))
  }
}
