package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meter.{GenConfig, MeterGen, Rollups}

/** Streaming correctness: the streamed rollup pipeline must produce exactly
  * the batch rollup on the same input (SURVEY §5.2 point 5), and the
  * arbitrary-state gap detector must fire on the planted gaps. */
class StreamingSpec extends SparkSpec {

  test("stream minute rollup == batch minute rollup on same ticks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = GenConfig(numMeters = 2, ticks = 300)

    val input = MemoryStream[Long]
    input.addData(0L until (cfg.ticks * cfg.numMeters): _*)
    val secStream = input.toDF()
      .select(
        (col("value") % cfg.numMeters).cast("int").as("said"),
        timestamp_seconds(expr(s"value DIV ${cfg.numMeters}") +
          cfg.startEpochSec).as("datetime"))
      .withColumn("joules", MeterGen.joulesExpr(MeterGen.wattsExpr(cfg), cfg))

    val rolled = MeterStream.rollupStream(secStream, "minute")
    val q = rolled.writeStream
      .format("memory").queryName("mins")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only below-watermark windows; advance the
      // watermark with one late-but-future tick batch
      input.addData((cfg.ticks * cfg.numMeters) until
        (cfg.ticks * cfg.numMeters + 2 * 600): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("mins")
      .filter(col("datetime") < timestamp_seconds(lit(cfg.startEpochSec + 300)))
    val batch = Rollups.minute(MeterGen.secondTable(spark, cfg))
    assert(streamed.count() === 10) // 5 full minutes × 2 meters
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("flatMapGroupsWithState gap detection fires on planted gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Ping]
    def ping(u: Long, sec: Long) =
      EventStreams.Ping(u, new Timestamp(1704067200000L + sec * 1000))
    input.addData(ping(1, 0), ping(1, 10), ping(1, 400), // gap 390 s
      ping(2, 0), ping(2, 5)) // no gap
    val gaps = EventStreams.detectGaps(input.toDS(), gapMs = 300000)
    val q = gaps.writeStream.format("memory").queryName("gaps")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // state persists across batches: next ping after silence also fires
      input.addData(ping(2, 1000)) // 995 s after last
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gaps").as[EventStreams.Gap].collect()
      .sortBy(g => (g.user_id, g.last_seen.getTime))
    assert(got.length === 2)
    assert(got(0).user_id === 1 && got(0).silent_ms === 390000)
    assert(got(1).user_id === 2 && got(1).silent_ms === 995000)
  }

  test("s6 lag-shape gap query ≡ stateful detectGaps on the events fixture") {
    import spark.implicits._
    // The s6 gate query computes gaps declaratively (lag over event time);
    // detectGaps computes the same thing with per-key state. Run both over
    // the real events fixture and demand identical rows. The stateful
    // operator works at Timestamp.getTime (ms) precision, so the batch
    // side here uses unix_millis — the registered s6 query is the same
    // shape at full µs precision, hash-checked by the driver gate.
    val gapMs = 30L * 60 * 1000
    val ev = graft.Tables.load(spark, sf(), "events")
    val pings = ev.select(col("user_id"), col("ts")).as[EventStreams.Ping]
    // The stateful operator's contract is millisecond event time
    // (Timestamp.getTime): within-one-ms ordering is unspecified, and at
    // ms precision the emitted gaps are invariant to it. So the batch side
    // pins a total order with the event_id tiebreak (same as registered
    // s6) and BOTH sides compare last_seen at unix_millis — comparing the
    // raw µs timestamps would make the test flaky on same-ms events.
    val stateful = EventStreams.detectGaps(pings, gapMs).toDF()
      .select(col("user_id"),
        unix_millis(col("last_seen")).as("last_seen_ms"), col("silent_ms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = ev
      .select(col("user_id"), col("event_id"), col("ts"),
        lag(col("ts"), 1).over(w).as("last_seen"))
      .withColumn("silent_ms",
        unix_millis(col("ts")) - unix_millis(col("last_seen")))
      .filter(col("silent_ms") > gapMs)
      .select(col("user_id"),
        unix_millis(col("last_seen")).as("last_seen_ms"), col("silent_ms"))
    assert(stateful.count() > 0, "fixture has no gaps — test is vacuous")
    assert(stateful.exceptAll(batch).count() === 0 &&
      batch.exceptAll(stateful).count() === 0,
      "stateful and declarative gap detection diverged")
  }

  test("transformWithState gap detection matches flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState supports only the RocksDB state store provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventStreams.Ping]
      def ping(u: Long, sec: Long) =
        EventStreams.Ping(u, new Timestamp(1704067200000L + sec * 1000))
      input.addData(ping(1, 0), ping(1, 10), ping(1, 400), // gap 390 s
        ping(2, 0), ping(2, 5)) // no gap
      val gaps = EventStreams.detectGapsTws(input.toDS(), gapMs = 300000)
      val q = gaps.writeStream.format("memory").queryName("gaps_tws")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        input.addData(ping(2, 1000)) // state survives across batches
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("gaps_tws").as[EventStreams.Gap].collect()
        .sortBy(g => (g.user_id, g.last_seen.getTime))
      assert(got.length === 2)
      assert(got(0).user_id === 1 && got(0).silent_ms === 390000)
      assert(got(1).user_id === 2 && got(1).silent_ms === 995000)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("foreachBatch rollup sink: idempotent multi-grain write, golden totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir("graft_fb")
    val cfg = GenConfig(numMeters = 2, ticks = 120)
    val input = MemoryStream[Long]
    val sec = input.toDF()
      .select((col("value") % cfg.numMeters).cast("int").as("said"),
        timestamp_seconds(expr(s"value DIV ${cfg.numMeters}") +
          cfg.startEpochSec).as("datetime"),
        lit(59).as("joules"))
    val q = MeterStream.writeRollups(sec, out, s"$out/_cp").start()
    try {
      // two micro-batches so grain buckets span batch boundaries — the
      // stored partials must re-compose exactly on read
      input.addData(0L until 150L: _*)
      q.processAllAvailable()
      input.addData(150L until (cfg.ticks * cfg.numMeters): _*)
      q.processAllAvailable()
    } finally q.stop()
    // round trip through the read API: partials re-aggregate to goldens
    val store = graft.meter.MeterStore(out)
    val minute = store.energyReport(spark, "minute")
    assert(minute.count() === 4) // 2 meters × 2 minutes
    assert(minute.collect().forall(_.getAs[Long]("joules") === 3540L))
    val day = store.energyReport(spark, "day")
    assert(day.agg(sum("joules")).collect()(0).getLong(0) === 2L * 120 * 59)
    // raw per-second layout is batch-partitioned but complete
    assert(spark.read.parquet(s"$out/meter_samples_second").count() ===
      cfg.ticks * cfg.numMeters)
  }

  test("file stream source: parquet directory drives the same rollup") {
    import spark.implicits._
    val dir = tmpDir("graft_fs")
    val cfg = GenConfig(numMeters = 2, ticks = 60)
    val batchSec = MeterGen.secondTable(spark, cfg)
    batchSec.write.mode("overwrite").parquet(dir)
    val stream = graft.sources.Formats.readParquetStream(
      spark, dir, batchSec.schema)
    val rolled = MeterStream.rollupStream(stream, "minute")
    val q = rolled.writeStream.format("memory").queryName("fsmins")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("fsmins")
    assert(got.count() === 2) // 1 minute × 2 meters
    assert(got.collect().forall(_.getAs[Long]("joules") === 3540L))
  }

  test("stream-stream interval join == batch interval join on same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    def ts(min: Long) = new Timestamp(t0 + min * 60000)
    // clicks at 10/70/200 min; views at 0/5/65/199/201 min for user 1,
    // plus a decoy user-2 view that must never match user-1 clicks.
    val clickRows = Seq((1L, 100L, ts(10)), (1L, 101L, ts(70)),
      (1L, 102L, ts(200)), (2L, 103L, ts(10)))
    val viewRows = Seq((1L, 200L, ts(0)), (1L, 201L, ts(5)),
      (1L, 202L, ts(65)), (1L, 203L, ts(199)), (1L, 204L, ts(201)),
      (2L, 205L, ts(8)))
    def shape(df: org.apache.spark.sql.DataFrame, id: String, t: String) =
      df.toDF("u", "e", "t").select(col("u"), col("e").as(id),
        col("t").as(t))
    val lin = MemoryStream[(Long, Long, Timestamp)]
    val rin = MemoryStream[(Long, Long, Timestamp)]
    lin.addData(clickRows: _*)
    rin.addData(viewRows: _*)
    val joined = EventStreams.intervalJoin(
      shape(lin.toDF().withWatermark("_3", "10 minutes"), "click_id", "click_ts"),
      shape(rin.toDF().withWatermark("_3", "10 minutes"), "view_id", "view_ts")
        .withColumnRenamed("u", "vu"),
      col("u") === col("vu"), col("click_ts"), col("view_ts"), "1 hour")
      .select("u", "click_id", "view_id")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ivj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStreams.intervalJoin(
      shape(clickRows.toDF(), "click_id", "click_ts"),
      shape(viewRows.toDF(), "view_id", "view_ts").withColumnRenamed("u", "vu"),
      col("u") === col("vu"), col("click_ts"), col("view_ts"), "1 hour")
      .select("u", "click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // and the batch semantics are what we think: 10-min click sees both
    // early views, 70-min click sees 65-min view only, 200-min click sees
    // 199 (not 201 — future), user 2 isolated.
    assert(batch === Set((1L, 100L, 200L), (1L, 100L, 201L),
      (1L, 101L, 202L), (1L, 102L, 203L), (2L, 103L, 205L)))
  }

  test("stream-stream join pairs rows across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000)
    val vin = MemoryStream[(Long, Long, Timestamp)]
    val cin = MemoryStream[(Long, Long, Timestamp)]
    val vDf = vin.toDF().toDF("v_user", "view_id", "view_ts")
      .withWatermark("view_ts", "2 hours")
    val cDf = cin.toDF().toDF("user_id", "click_id", "click_ts")
      .withWatermark("click_ts", "2 hours")
    val joined = cDf.join(vDf,
      col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("click_ts"))
      .select("user_id", "click_id", "view_id")
    val q = joined.writeStream.format("memory").queryName("xbatch")
      .outputMode("append").start()
    try {
      // batch 1: the view only — buffered in join state, nothing emits
      vin.addData((1L, 200L, ts(0)))
      q.processAllAvailable()
      assert(spark.table("xbatch").count() === 0)
      // batch 2: the click, 30 min later — must pair with the BUFFERED
      // view from batch 1 (inside the 1 h band and the 2 h horizon)
      cin.addData((1L, 100L, ts(30)))
      q.processAllAvailable()
      val got = spark.table("xbatch").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((1L, 100L, 200L)))
    } finally q.stop()
  }

  test("RocksDB state store: session state evicts under watermark advance (metrics-asserted)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateStores.rocksDb.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val in = MemoryStream[(Long, Timestamp)]
      val t0 = 1704067200000L // 2024-01-01T00:00:00Z
      def ts(sec: Long) = new Timestamp(t0 + sec * 1000)
      val sessions = EventStreams.sessions(
        in.toDF().toDF("user_id", "ts").withWatermark("ts", "10 seconds"),
        "30 seconds")
      val q = sessions.writeStream.format("memory").queryName("rocks_sessions")
        .outputMode("append").start()
      try {
        // 20 users, two pings each → 20 open sessions held in state
        in.addData((0L until 20L).flatMap(u => Seq((u, ts(0)), (u, ts(5)))): _*)
        q.processAllAvailable()
        // jump event time 10 minutes: watermark passes every session's
        // close, all 20 must emit and their state rows must be EVICTED
        in.addData((99L, ts(600)))
        q.processAllAvailable()
        in.addData((99L, ts(1200)))
        q.processAllAvailable()
        val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
        val totals = progs.map(_.stateOperators(0).numRowsTotal)
        assert(totals.max >= 20L, s"state never held the open sessions: ${totals.toSeq}")
        assert(totals.last <= 2L,
          s"state not evicted after watermark advance: ${totals.toSeq}")
        assert(progs.exists(_.stateOperators(0).numRowsRemoved > 0L),
          "no state removals reported")
        // the provider actually engaged: rocksdb custom metrics present
        import scala.jdk.CollectionConverters._
        assert(progs.last.stateOperators(0).customMetrics.keySet.asScala
          .exists(_.startsWith("rocksdb")), "RocksDB provider not engaged")
        // and the emitted sessions are the right ones: 20 closed sessions
        // of 2 events each for users 0..19, then user 99's first session
        val out = spark.table("rocks_sessions")
          .select("user_id", "n_events").collect()
          .map(r => r.getLong(0) -> r.getLong(1))
        assert(out.count(_._2 == 2L) >= 20)
      } finally q.stop()
    } finally StateStores.rocksDb.keys.foreach(spark.conf.unset)
  }

  test("dropDuplicatesWithinWatermark dedups the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = GenConfig(numMeters = 1, ticks = 60)
    val input = MemoryStream[Long]
    val ids = 0L until 60L
    input.addData(ids ++ ids: _*) // every second twice
    val sec = input.toDF()
      .select(lit(0).as("said"),
        timestamp_seconds(col("value") + cfg.startEpochSec).as("datetime"),
        lit(59).as("joules"))
    val deduped = MeterStream.dedupWithinWatermark(sec)
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup").count() === 60)
  }

  test("streaming forward fill == batch gapFillHourly, state carried " +
    "across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.load(spark, sf(), "events")
    // finalized hourly observations — what an upstream watermarked hourly
    // aggregation emits in append mode, in event-time order
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("v"))
      .select(col("user_id"), unix_millis(col("hour")).as("hour_ms"),
        col("v"))
      .as[EventStreams.HourObs].collect().sortBy(_.hour_ms)
    // split on a mid-corpus hour: per-user hour order is preserved across
    // the two batches, and fills spanning the cut exercise carried state
    val cut = hourly(hourly.length / 2).hour_ms
    val (b1, b2) = hourly.partition(_.hour_ms <= cut)
    assert(b1.nonEmpty && b2.nonEmpty)

    val input = MemoryStream[EventStreams.HourObs]
    val q = EventStreams.fillGapsHourly(input.toDS()).writeStream
      .format("memory").queryName("ffill_stream")
      .outputMode("append").start()
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      input.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ffill_stream")
      .select(col("user_id"), col("hour_ms"), col("v"),
        col("was_observed").cast("long").as("was_observed"))
    val batch = graft.queries.TimeSeries
      .gapFillHourly(ev, "user_id", "ts", count(lit(1)).cast("long"))
      .select(col("user_id"), unix_millis(col("hour")).as("hour_ms"),
        col("filled").as("v"), col("was_observed"))
    assert(streamed.count() > hourly.length,
      "no gap rows were filled — the fixture makes this test vacuous")
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0,
      "streaming forward fill diverged from the batch operator")
  }

  test("s19: crash mid-batch + restart from checkpoint is exactly-once (batch-equal)") {
    // the gate row certifies this against DuckDB; this spec keeps the
    // same proof inside sbt test — the query fn itself injects the
    // torn-write crash, restarts from the checkpoint, and re-delivers
    // in-horizon rows that only survive dedup if state was recovered
    val dir = sf("sf0.001")
    val streamed = graft.SparkEntry.queries("s19_crash_recovery")(spark, dir)
    val batch = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0,
      "crash-recovered stream diverged from the batch aggregate")
  }
}
