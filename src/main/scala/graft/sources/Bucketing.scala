package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table utilities for co-located joins (SURVEY §2b partitioning).
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
  * both sides bucketed (and sorted) by the join key lets Spark plan a
  * shuffle-free sort-merge join: each task reads bucket i of both tables.
  * This is the Parquet-world equivalent of the reference's choice to key
  * every Cassandra table by `(said, datetime)` so related rows co-locate
  * (setup_and_notes.txt:16-44).
  */
object Bucketing {

  /** A managed table's location can outlive the catalog entry: the catalog
    * is in-memory (per JVM) while the warehouse directory is on disk, so a
    * bench run followed by a fresh-JVM gate run leaves a directory the new
    * catalog has never heard of — and `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS instead of overwriting. Clear the orphaned
    * location so every write is hermetic against prior-process state.
    *
    * Safety against CONCURRENT processes sharing the warehouse dir relies
    * on the caller keying table names per process (q42 appends the pid):
    * "not in this JVM's catalog" then implies "no live JVM owns it" — the
    * only process that could have a live table at this path is the one
    * whose pid is in the name, i.e. us. Without a per-process name this
    * delete could race a sibling JVM's live table. */
  private def clearStaleLocation(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      val loc = spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

  /** Write `df` as a bucketed+sorted managed table (in-catalog parquet).
    *
    * The input is first repartitioned by the bucket key into exactly
    * `numBuckets` partitions. `repartition(n, col)` and the bucket-id
    * assignment use the same function (`HashPartitioning(col, n)
    * .partitionIdExpression`), so every write task holds exactly one
    * bucket's rows → ONE file per bucket instead of (input partitions ×
    * buckets) fragments. That single-file-per-bucket layout is also what
    * lets the planner trust the `sortBy` metadata and elide the join-side
    * Sort, not just the Exchange. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit = {
    clearStaleLocation(df.sparkSession, table)
    df.repartition(numBuckets, col(bucketCol))
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Idempotent build: write only if this session hasn't already. Callers
    * whose table name keys the input (q42's per-sf-dir tag) get
    * build-once-join-many semantics — a bench rep after the first times
    * the co-located join alone, not the table write.
    *
    * Staleness contract: freshness is keyed on catalog existence ONLY.
    * If the input data can change under a running session, the caller
    * must fold an input fingerprint into `table` (q42 hashes the source
    * files' name/size/mtime) — otherwise a regenerated sf dir would
    * silently join a stale bucketed copy. */
  def ensureBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writeBucketed(df, table, bucketCol, numBuckets)

  /** Owning drop: removes the catalog entry AND the location, whichever
    * of the two exists, so repeated runs never accrete warehouse state. */
  def dropBucketed(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    clearStaleLocation(spark, table)
  }

  /** Garbage-collect warehouse locations left by DEAD processes. Per-pid
    * table names (q42) make concurrent JVMs collision-free, but each pid
    * leaves its `graft_bk_*_p<pid>` dirs behind when it exits; without a
    * sweep the shared warehouse accretes one table pair per process
    * forever.
    *
    * Deletion criteria, both required:
    *   - the embedded pid is not alive (only the creating process can
    *     hold the table live, because the name embeds its own pid) —
    *     NOTE this check sees only the local PID namespace, so the sweep
    *     assumes warehouse-sharing processes share a host+namespace;
    *     deployments mounting one warehouse across containers must use
    *     per-process `spark.sql.warehouse.dir` instead;
    *   - the dir hasn't been modified for `graceMs` (default 10 min) —
    *     a freshly written table whose owner the liveness probe can't
    *     see (pid-namespace blind spot, pid reuse races) is never
    *     deleted mid-query; abandoned dirs age past the grace window
    *     and are then collected.
    * Legacy tag-only names from before the pid scheme
    * (`graft_bk_*_<hex>`, no live writers exist) age out the same way. */
  def sweepDeadBucketed(spark: SparkSession,
      graceMs: Long = 10L * 60 * 1000): Unit = {
    val probe = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_bk_probe")))
    val wh = probe.getParent
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) {
      val tagged = "^graft_bk_.*_p(\\d+)$".r
      val legacy = "^graft_bk_.*$".r
      val self = ProcessHandle.current().pid()
      val cutoff = System.currentTimeMillis() - graceMs
      fs.listStatus(wh).foreach { st =>
        val aged = st.getModificationTime < cutoff
        st.getPath.getName match {
          case tagged(pid) if pid.toLong != self && aged => {
            val h = ProcessHandle.of(pid.toLong)
            if (!(h.isPresent && h.get().isAlive)) fs.delete(st.getPath, true)
          }
          case tagged(_) => () // own tables, or too fresh to judge
          case legacy() if aged &&
              !spark.catalog.tableExists(st.getPath.getName) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
  }

  /** Join two bucketed tables on their bucket key — planner elides both
    * exchanges when bucket specs line up. */
  def colocatedJoin(spark: SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Same, for differently-named keys (e.g. o_orderkey = l_orderkey):
    * bucket-spec compatibility is positional on the join expressions, so
    * the exchanges still elide. */
  def colocatedJoinOn(spark: SparkSession,
      leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
}
