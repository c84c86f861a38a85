package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meter.{GenConfig, MeterGen, Rollups, SaidSeed}
import graft.sources.ParquetSink
import graft.streaming.MeterStream

/** CLI entry point mirroring the reference's `-main` (core.clj:163-176):
  *
  *   runMain graft.Main [numMeters] [ticks] [outDir] [--stream]
  *
  * Batch mode generates a closed time range in one job (the deterministic
  * replacement for the drifting 1 Hz sleep loop); `--stream` drives the
  * same derivation from a rate source. The starting said is seeded from
  * the host name via said_seed — "different SAIDs on different hosts,
  * always the same SAID on the same host" (core.clj:28-30).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val numMeters = pos.lift(0).map(_.toInt).getOrElse(2) // core.clj:16-18
    val ticks = pos.lift(1).map(_.toLong).getOrElse(60L)
    val outDir = pos.lift(2).getOrElse("/tmp/graft_out")
    val streamMode = args.contains("--stream")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .withExtensions(new plans.GraftExtensions)
      .appName("graft-meter-gen")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hostId = java.net.InetAddress.getLocalHost.getHostName
    val startSaid = SaidSeed.saidSeed(hostId)
    println(s"[graft] host=$hostId startSaid=$startSaid " +
      s"meters=$numMeters ticks=$ticks out=$outDir stream=$streamMode")

    val cfg = GenConfig(numMeters = numMeters, startSaid = startSaid,
      ticks = ticks)

    if (streamMode) {
      val raw = MeterStream.rateTransmissions(spark, cfg, rowsPerSecond = 1)
      val q = MeterStream.writeRollups(
        MeterStream.toSecond(raw, cfg), outDir, s"$outDir/_checkpoint")
        .start()
      q.awaitTermination(ticks * 1000 + 10000)
      q.stop()
    } else {
      val sink = new ParquetSink(outDir,
        Map("meter_samples" -> Seq("dt", "said_bucket")))
      val raw = MeterGen.transmissions(spark, cfg)
      sink.write(
        raw.withColumn("dt", to_date(col("datetime")))
          .withColumn("said_bucket", pmod(col("said"), lit(16))),
        "meter_samples")
      val second = MeterGen.secondTable(spark, cfg)
      Rollups.all(second).foreach { case (grain, df) =>
        sink.write(if (grain == "second") df else df.coalesce(1),
          s"meter_samples_$grain")
      }
      println(s"[graft] wrote raw + 4 rollup tables to $outDir")
    }
    spark.stop()
  }
}
