package graft.meter

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Read-side API over the written store layout: Q1 raw-range extraction must
  * prune partitions (the 100 TB property — a said+time query reads only its
  * dt/said_bucket directories), and Q2 grain reports must route to stored
  * rollups, re-aggregating exactly for coarser-than-stored grains. */
class MeterStoreSpec extends SparkSpec {

  // 4 meters × 2 days spanning a midnight boundary, starting 2023-12-31 12:00.
  // The per-second frame is built directly with the golden 59 J/s (the
  // generator's own arithmetic is covered by m1/m2 and MeterGenSpec) so the
  // fixture write stays fast at 691k rows.
  private val cfg = GenConfig(numMeters = 4, ticks = 172800,
    startEpochSec = 1704024000L)

  private lazy val store: MeterStore = {
    val dir = tmpDir("graft_store")
    val sec = spark.range(0, cfg.ticks * cfg.numMeters)
      .select((col("id") % cfg.numMeters).cast("int").as("said"),
        timestamp_seconds(expr(s"id DIV ${cfg.numMeters}") +
          cfg.startEpochSec).as("datetime"),
        lit(59).as("joules"))
    Rollups.writeRaw(sec, s"$dir/meter_samples", saidBuckets = 2)
    Rollups.all(sec).foreach { case (g, df) =>
      Rollups.writeRollup(df, s"$dir/meter_samples_$g")
    }
    MeterStore(dir)
  }

  test("rawRange prunes to the matching dt/said_bucket partitions") {
    val q = store.rawRange(spark, saids = Seq(1),
      from = "2024-01-01 00:00:00", to = "2024-01-01 06:00:00",
      saidBuckets = 2)
    assert(q.count() == 6 * 3600)
    // partition pruning: of 2 dt × 2 bucket dirs the scan must touch only
    // dt=2024-01-01/said_bucket=1
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split("\n"))
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(scanned.contains("dt"), s"no dt partition filter:\n$scanned")
    assert(scanned.contains("said_bucket"),
      s"no said_bucket partition filter:\n$scanned")
    val files = q.queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount }
    assert(files.nonEmpty && files.head == 1,
      s"expected 1 surviving hive partition, got $files")
  }

  test("energyReport at a stored grain reads that grain's table (idempotent re-agg)") {
    val hour = store.energyReport(spark, "hour")
    assert(hour.count() == cfg.numMeters * 48)
    assert(hour.agg(sum("joules")).head.getLong(0) ==
      cfg.numMeters.toLong * cfg.ticks * 59)
  }

  test("energyReport at month grain re-aggregates the day table exactly") {
    val month = store.energyReport(spark, "month")
    val rows = month.orderBy("said", "datetime").collect()
    // range spans Dec 2023 (12 h) and Jan 2024 (36 h) for each of 4 meters
    assert(rows.length == cfg.numMeters * 2)
    val dec = rows.filter(_.getTimestamp(1).toString.startsWith("2023-12"))
    assert(dec.forall(_.getLong(2) == 12L * 3600 * 59))
    val jan = rows.filter(_.getTimestamp(1).toString.startsWith("2024-01"))
    assert(jan.forall(_.getLong(2) == 36L * 3600 * 59))
  }
}
