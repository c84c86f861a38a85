package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Physical-layout clustering: co-locate rows by key, then order them
  * WITHIN each partition — `sortWithinPartitions`, the partition-local
  * sort surface (SURVEY §2b).
  *
  * Why this matters at 100 TB: a global `orderBy` before a write is a
  * full range-shuffle of the entire dataset just to get file-local
  * ordering; `repartition(key) + sortWithinPartitions(key, ts)` gets the
  * same parquet row-group locality (run-length-friendly key columns,
  * tight zone-map min/max on the sort columns, so later range scans prune
  * row groups) with ONE hash shuffle and a spillable local sort — no
  * global range boundary computation, no skewed range partitions.
  */
object Clustering {

  /** Hash-partition on `partCols`, then sort each partition by `sortCols`.
    * The plan is Exchange(hashpartitioning) → Sort(global=false) — no
    * second exchange (asserted in PlanSpec). */
  def clusterForScan(df: DataFrame, partCols: Seq[String],
      sortCols: Seq[String]): DataFrame =
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)

  /** Partition-local sort only (no repartition): orders rows inside
    * whatever partitioning the upstream already established — zero
    * shuffle. */
  def localSort(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    df.sortWithinPartitions(sortCols: _*)
}
