package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md / FIXTURES.md).
  *
  * All tables are plain parquet files; reads go through the vectorized parquet
  * reader and benefit from predicate pushdown / column pruning automatically,
  * so callers should express filters/projections declaratively on the returned
  * DataFrame rather than materializing it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
      // parquet reader rejects unless nanosAsLong is set. The engine's
      // session builders set it at build time; the guard below only covers
      // foreign sessions (set once, not on every load), truncating to
      // microseconds — matching DuckDB's TIMESTAMP_NS→TIMESTAMP truncation
      // on the oracle side.
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
            .contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture as a temp view so `spark.sql(...)` works (SQL
    * entry point, SURVEY §3.4). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** One verifiable unit of the engine's query surface: a Spark implementation
  * plus (where SQL-expressible) an equivalent DuckDB oracle query used by the
  * driver's correctness gate. Column names/types and row order must match
  * between the two — the compare sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
