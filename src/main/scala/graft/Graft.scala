package graft

import org.apache.spark.sql.SparkSession

/** Engine front door: a SparkSession builder with the configuration the
  * engine is designed around. Callers on a real cluster pass their own
  * master/memory; these settings are the data-shape-dependent ones.
  *
  * Scale rationale (SURVEY §4.3, builder prompt):
  *  - shuffle.partitions sized to cores locally; on a 1000-executor
  *    cluster raise to ~2-3× total cores (AQE coalesces the excess).
  *  - maxPartitionBytes at 128 MB: the raw meter table is ~46 KB/row, so
  *    a scan partition holds ~2,900 rows of 15k-float arrays — comfortably
  *    in executor memory even with decode amplification.
  *  - AQE on: runtime shuffle coalescing, skew-join splitting, and
  *    broadcast conversion are the main levers the engine relies on
  *    instead of hand-tuned per-query hints.
  *  - UTC session timezone: all reference timestamps are UTC
  *    (core.clj:63-66); oracle parity requires it.
  */
object Graft {
  def sessionBuilder(appName: String = "graft",
      master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** JSON string literal (quotes included): escapes backslash, quote, and
    * ALL control chars < 0x20 — a tab or CR in an exception message or in
    * builder-authored SQL must not invalidate a single-line artifact. */
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def session(): SparkSession = {
    val s = sessionBuilder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    meter.SaidSeed.register(s)
    s
  }
}
