package graft.streaming

/** Streaming state-store configuration for the 100 TB design point.
  *
  * The default HDFS-backed store keeps every state row on the JVM heap —
  * fine for the fixtures, fatal when session/interval-join state reaches
  * executor-memory scale (the reference's 1 Hz transmission loop against
  * a large fleet, or any long-lookback stream join). RocksDB moves state
  * off-heap with spill-to-disk, bounded memory, and incremental
  * (changelog) checkpointing so a commit uploads the batch's delta rather
  * than a full store snapshot.
  *
  * Shipped as a conf map rather than baked into the session builder:
  * state-store choice is per-workload (tiny dashboards don't want RocksDB
  * file management), and the keys are ordinary session confs a caller
  * applies before starting the query. Asserted live — provider engaged,
  * state evicted under watermark advance, rocksdb metrics reported — in
  * StreamingSpec.
  */
object StateStores {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Confs for RocksDB-backed streaming state with changelog
    * checkpointing. */
  val rocksDb: Map[String, String] = Map(
    ProviderKey ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // checkpoint the per-batch changelog, not a full snapshot per commit
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")
}
