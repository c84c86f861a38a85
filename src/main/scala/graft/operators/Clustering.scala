package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton) interleaving of two non-negative dimension values,
    * `bits` bits each: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Sorting by this single key clusters rows that are close in
    * BOTH dimensions, so parquet zone maps (row-group min/max) prune
    * range predicates on EITHER column — the layout trick single-column
    * sorting can't give (sorting by a leaves b scattered across every
    * row group). Pure bit arithmetic on built-in Column ops: stays in
    * whole-stage codegen, no UDF, no shuffle of its own.
    *
    * Callers map each dimension to a bounded non-negative int first —
    * e.g. a day number, a bucket id, `ntile`, or a quantized measure.
    * Inputs ≥ 2^bits fold into the top cell rather than corrupting
    * neighbors (they are masked). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster for multi-dimensional range scans: hash-partition on
    * `partCols` (or round-robin when empty), then order each partition by
    * the z-value of the two dimension columns. Same one-exchange plan
    * shape as [[clusterForScan]], but zone maps now serve range
    * predicates on both `dimA` and `dimB`. */
  def clusterZOrder(df: DataFrame, partCols: Seq[String],
      dimA: Column, dimB: Column, bits: Int = 16): DataFrame = {
    val keyed =
      if (partCols.nonEmpty) df.repartition(partCols.map(col): _*) else df
    keyed.sortWithinPartitions(zValue(dimA, dimB, bits))
  }
}
