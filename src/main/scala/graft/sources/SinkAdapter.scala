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

/** Cassandra connector shape (documented, not instantiable offline):
  *
  * {{{
  * df.write
  *   .format("org.apache.spark.sql.cassandra")
  *   .options(Map("keyspace" -> "disagg", "table" -> table))
  *   .mode("append")
  *   .save()
  * }}}
  *
  * Table layout mirrors the reference DDL: partition key `said`, clustering
  * key `datetime` (setup_and_notes.txt:16-44). Counter tables are replaced
  * by plain BIGINT rollup tables maintained by re-aggregation (SURVEY §7.3),
  * so plain INSERT overwrite semantics suffice — no non-idempotent
  * counter increments.
  */
final class CassandraSinkShape(keyspace: String) extends SinkAdapter {
  override def write(df: DataFrame, table: String): Unit =
    throw new UnsupportedOperationException(
      "Cassandra connector not available in this offline environment; " +
        "see scaladoc for the exact connector invocation.")
}
