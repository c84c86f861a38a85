package graft.sources

import org.apache.spark.sql.DataFrame

/** Pluggable sink layer (SURVEY §2b sources/sinks).
  *
  * The reference writes to Cassandra via prepared CQL statements
  * (core.clj:100-153). In Spark the equivalent is the DataSource V2
  * connector (`format("org.apache.spark.sql.cassandra")` with
  * keyspace/table options, partition key `said`, clustering key `datetime`
  * — matching the DDL at setup_and_notes.txt:16-44). This environment is
  * offline (no connector jar, no cluster), so the engine ships the adapter
  * seam: Parquet is the default implementation; the Cassandra shape is
  * documented below and slots in without touching pipeline code.
  */
trait SinkAdapter {
  def write(df: DataFrame, table: String): Unit
}

/** Default sink: partitioned, zstd-compressed Parquet per table. */
final class ParquetSink(baseDir: String,
    partitionCols: Map[String, Seq[String]] = Map.empty) extends SinkAdapter {
  override def write(df: DataFrame, table: String): Unit = {
    val w = df.write.mode("append").option("compression", "zstd")
    partitionCols.get(table) match {
      case Some(cols) if cols.nonEmpty =>
        w.partitionBy(cols: _*).parquet(s"$baseDir/$table")
      case _ => w.parquet(s"$baseDir/$table")
    }
  }
}

/** Cassandra connector shape (config buildable and validated offline; the
  * save itself needs the connector jar + a cluster):
  *
  * {{{
  * val cfg = sink.writeConfig(table)   // validated, pure data
  * df.write.format(cfg.format).options(cfg.options).mode(cfg.mode).save()
  * }}}
  *
  * Table layout mirrors the reference DDL: partition key `said`, clustering
  * key `datetime` (setup_and_notes.txt:16-44). Counter tables are replaced
  * by plain BIGINT rollup tables maintained by re-aggregation (SURVEY §7.3),
  * so plain INSERT overwrite semantics suffice — no non-idempotent
  * counter increments.
  */
final class CassandraSinkShape(keyspace: String,
    extraOptions: Map[String, String] = Map.empty,
    format: String = CassandraSinkShape.Format) extends SinkAdapter {
  import CassandraSinkShape._

  /** The exact writer configuration the connector invocation would use —
    * validated eagerly so a bad keyspace/table/option key fails at parse
    * time in ANY environment, not at save time on a cluster. */
  def writeConfig(table: String): WriteConfig = {
    require(Identifier.matches(keyspace),
      s"keyspace '$keyspace' is not a valid unquoted CQL identifier " +
        "(lowercase alphanumeric/underscore, starts with a letter, <= 48 chars)")
    require(Identifier.matches(table),
      s"table '$table' is not a valid unquoted CQL identifier")
    extraOptions.keys.foreach(k => require(
      OptionKeys.contains(k) || k.startsWith("spark.cassandra."),
      s"unknown connector option '$k' — documented keys: " +
        OptionKeys.mkString(", ") + ", or any spark.cassandra.* conf"))
    WriteConfig(Format,
      Map("keyspace" -> keyspace, "table" -> table) ++ extraOptions,
      mode = "append")
  }

  override def write(df: DataFrame, table: String): Unit = {
    val cfg = writeConfig(table) // must parse even where the save cannot run
    if (format == Format) throw new UnsupportedOperationException(
      "Cassandra connector not available in this offline environment; " +
        "writeConfig(table) carries the validated invocation, " +
        "bindRows(df, table, ...) the wire-serialized row stream, and " +
        "writeBound(...) drives the same invocation against a substitute " +
        "format (e.g. RecordingSink.Format).")
    df.write.format(format).options(cfg.options).mode(cfg.mode).save()
  }

  /** The row-level write path, end to end: serialize every row through
    * the CQL wire encoders ([[bindRows]] — partition-key routed,
    * clustering-ordered, protocol-v4 value frames) and DRIVE the
    * connector-shaped invocation `df.write.format(...).options(...)
    * .mode(...).save()` with the validated config plus the table's DDL
    * key metadata. The production path for a live cluster stays
    * [[write]] (raw columns — the connector does its own encoding);
    * THIS path certifies the row-level wire stream: under
    * [[RecordingSink.Format]] the invocation lands in an in-JVM V2
    * table that records the rows —
    * how SinkAdapterSpec certifies, offline, that the option plumbing
    * drives an actual DataSource V2 write whose recorded bytes equal
    * the m9 golden vectors. */
  def writeBound(df: DataFrame, table: String, partitionKeys: Seq[String],
      clusteringKeys: Seq[String]): Unit = {
    val cfg = writeConfig(table)
    if (format == Format) throw new UnsupportedOperationException(
      "Cassandra connector not available in this offline environment; " +
        "substitute a format (e.g. RecordingSink.Format) to drive the " +
        "row-level write path")
    val bound = bindRows(df, table, partitionKeys, clusteringKeys)
    bound.write.format(format)
      .options(cfg.options)
      .option("partition_key", partitionKeys.mkString(","))
      .option("clustering_key", clusteringKeys.mkString(","))
      .mode(cfg.mode)
      .save()
  }

  /** The row stream the connector's executors would consume: every row
    * serialized through the CQL native-protocol encoders ([[CqlBind]] —
    * statement text + length-prefixed binary values), repartitioned by
    * the partition key and clustering-ordered within partitions, i.e.
    * the write path exercised end to end up to the socket. Gate row m9
    * hash-verifies these bytes against a DuckDB replay; golden byte
    * vectors in SinkAdapterSpec. */
  def bindRows(df: DataFrame, table: String, partitionKeys: Seq[String],
      clusteringKeys: Seq[String]): DataFrame = {
    writeConfig(table) // same eager identifier validation as write()
    CqlBind.bindRows(df, keyspace, table, partitionKeys, clusteringKeys)
  }
}

object CassandraSinkShape {
  /** Writer invocation as pure data. */
  final case class WriteConfig(format: String, options: Map[String, String],
      mode: String)

  /** DataSource V2 short name of the spark-cassandra-connector. */
  val Format = "org.apache.spark.sql.cassandra"

  /** Unquoted CQL identifier: lowercase start, alphanumeric/underscore,
    * at most 48 chars. */
  val Identifier = "^[a-z][a-z0-9_]{0,47}$".r

  /** Per-write option keys the connector documents (beyond the
    * spark.cassandra.* session confs, which pass through). */
  val OptionKeys: Set[String] = Set(
    "keyspace", "table", "cluster", "directJoinSetting", "confirm.truncate",
    "ttl", "writetime")
}
