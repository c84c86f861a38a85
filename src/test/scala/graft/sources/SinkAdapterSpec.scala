package graft.sources

import graft.SparkSpec

/** The sink seam: Parquet round-trips, and the Cassandra shape's writer
  * configuration parses/validates offline — the contract that keeps the
  * documented connector invocation honest without a cluster. */
class SinkAdapterSpec extends SparkSpec {

  test("ParquetSink round-trips a partitioned table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val sink = new ParquetSink(dir, Map("raw" -> Seq("day")))
    val df = Seq((1L, "2024-01-01", 10L), (2L, "2024-01-02", 20L))
      .toDF("said", "day", "joules")
    sink.write(df, "raw")
    val back = spark.read.parquet(s"$dir/raw")
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("said", "day", "joules"))
    // partition directories actually materialized
    val days = new java.io.File(s"$dir/raw").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(days === Set("day=2024-01-01", "day=2024-01-02"))
  }

  test("Cassandra shape: writeConfig carries the documented invocation for every engine table") {
    val sink = new CassandraSinkShape("disagg")
    for (table <- Seq("raw", "rollup_minute", "rollup_hour", "rollup_day",
        "rollup_all")) {
      val cfg = sink.writeConfig(table)
      assert(cfg.format === "org.apache.spark.sql.cassandra")
      assert(cfg.mode === "append")
      assert(cfg.options("keyspace") === "disagg")
      assert(cfg.options("table") === table)
    }
  }

  test("Cassandra shape: bad keyspace, table, or option key fails at parse time") {
    intercept[IllegalArgumentException] {
      new CassandraSinkShape("Bad-Name!").writeConfig("raw")
    }
    intercept[IllegalArgumentException] {
      new CassandraSinkShape("a" * 49).writeConfig("raw")
    }
    intercept[IllegalArgumentException] {
      new CassandraSinkShape("disagg").writeConfig("1bad table")
    }
    intercept[IllegalArgumentException] {
      new CassandraSinkShape("disagg",
        Map("keyspce" -> "typo")).writeConfig("raw")
    }
    // documented per-write keys and spark.cassandra.* confs pass
    val ok = new CassandraSinkShape("disagg", Map(
      "ttl" -> "86400",
      "spark.cassandra.output.consistency.level" -> "LOCAL_QUORUM"))
    assert(ok.writeConfig("raw").options.size === 4)
  }

  test("Cassandra shape: write still refuses offline, after validating") {
    import spark.implicits._
    val sink = new CassandraSinkShape("disagg")
    val df = Seq((1L, 2L)).toDF("said", "joules")
    intercept[UnsupportedOperationException] { sink.write(df, "raw") }
    // validation precedes the refusal: a bad table fails with the
    // parse-level error, not the environment error
    intercept[IllegalArgumentException] { sink.write(df, "BAD!") }
  }
}
