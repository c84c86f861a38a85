package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meter.{GenConfig, MeterGen, Rollups}

/** The SURVEY §4.2 rewrite rule: aggregates over the raw grain must be
  * re-routed to the coarsest registered rollup that answers them exactly —
  * and must NOT be re-routed when the rewrite would change results. */
class RollupRoutingSpec extends SparkSpec {

  private val cfg = GenConfig(numMeters = 3, ticks = 7200) // 2 h × 3 meters

  private lazy val grains: Map[String, DataFrame] = {
    val sec = MeterGen.secondTable(spark, cfg)
    Rollups.all(sec)
  }

  private def installed[A](f: => A): A = {
    RollupRouting.install(spark, grains)
    try f finally RollupRouting.uninstall(spark)
  }

  /** Does the analyzed plan read from the given registered grain table? */
  private def scans(df: DataFrame, grain: String): Boolean = {
    val entry = grains(grain).queryExecution.analyzed
    df.queryExecution.analyzed
      .collect { case p: LogicalPlan if p.sameResult(entry) => p }.nonEmpty
  }

  private def hourQuery: DataFrame =
    MeterGen.secondTable(spark, cfg)
      .groupBy(col("said"), date_trunc("hour", col("datetime")).as("datetime"))
      .agg(sum(col("joules")).as("joules"))

  test("hour-grain aggregate over raw seconds routes to the hour rollup") {
    val expected = hourQuery.orderBy("said", "datetime").collect()
    val routed = installed {
      val df = hourQuery
      assert(scans(df, "hour"), "plan still reads the second-grain table:\n" +
        df.queryExecution.analyzed)
      df.orderBy("said", "datetime").collect()
    }
    assert(routed.sameElements(expected))
  }

  test("month-grain aggregate routes to the day rollup (day-aligned)") {
    installed {
      val df = MeterGen.secondTable(spark, cfg)
        .groupBy(date_trunc("month", col("datetime")).as("month"))
        .agg(sum(col("joules")).as("joules"))
      assert(scans(df, "day"))
      // 3 meters × 7200 s; every second sums to the golden 59 J.
      assert(df.collect().map(_.getLong(1)).sum == 3L * 7200 * 59)
    }
  }

  test("said-only grouping (no time key) routes to day; said filter survives") {
    installed {
      val df = MeterGen.secondTable(spark, cfg)
        .filter(col("said") === 1)
        .groupBy(col("said")).agg(sum(col("joules")).as("joules"))
      assert(scans(df, "day"))
      val rows = df.collect()
      assert(rows.length == 1 && rows(0).getLong(1) == 7200L * 59)
    }
  }

  test("aggregate over the minute view at day grain routes to day") {
    installed {
      val df = grains("minute")
        .groupBy(date_trunc("day", col("datetime")).as("datetime"))
        .agg(sum(col("joules")).as("joules"))
      assert(scans(df, "day"))
    }
  }

  test("SQL path routes too") {
    installed {
      grains("second").createOrReplaceTempView("meter_second_v")
      val df = spark.sql(
        """SELECT said, date_trunc('hour', datetime) AS h, sum(joules) AS j
          |FROM meter_second_v GROUP BY 1, 2 ORDER BY said, h""".stripMargin)
      assert(scans(df, "hour"))
      assert(df.count() == 3 * 2) // 3 meters × 2 hours
    }
  }

  test("non-sum aggregates, sub-minute grains, and time filters do NOT route") {
    installed {
      val sec = MeterGen.secondTable(spark, cfg)
      val avgDf = sec.groupBy(col("said")).agg(avg(col("joules")).as("a"))
      assert(!scans(avgDf, "day") && !scans(avgDf, "minute"))
      val cntDf = sec.groupBy(col("said")).agg(count(lit(1)).as("n"))
      assert(!scans(cntDf, "day"))
      val secGrain = sec
        .groupBy(date_trunc("second", col("datetime"))).agg(sum(col("joules")))
      assert(!scans(secGrain, "minute"))
      val timeFiltered = sec
        .filter(col("datetime") > lit("2024-01-01 00:30:15"))
        .groupBy(col("said")).agg(sum(col("joules")).as("j"))
      assert(!scans(timeFiltered, "day"))
      // count must still see raw-grain row counts
      assert(cntDf.collect().map(_.getLong(1)).toSet == Set(7200L))
    }
  }

  test("routing is inert with no catalog installed") {
    val df = hourQuery
    assert(!scans(df, "hour"))
  }
}
