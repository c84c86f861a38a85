package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join certification — the AUTOMATIC complement to
  * `operators.Salting` (q43's manual mitigation): with adaptive
  * execution on, a sort-merge join whose build side has one pathological
  * key must be split at runtime (`isSkewJoin`), and the split must be
  * result-invariant. At 100 TB this is the first line of defense against
  * hot keys; salting remains for aggregations and for joins AQE cannot
  * split (e.g. when the skewed side must stay co-partitioned). Thresholds
  * are scoped to the test and restored — fixture-scale partitions are far
  * below the production defaults. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime, same results") {
    // 95% of the left side shares key 7
    val left = spark.range(0, 200000).select(
      when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val right = spark.range(0, 200000, 3).select(col("id").as("k"),
      concat(lit("r"), col("id")).as("name"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val j = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("v_sum"))
      val Array(row) = j.collect()
      // runtime plan shows the skew split
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
      // result-invariance: key 7 matches iff 7 ∈ right (it is not: 7 % 3
      // != 0) → expected = matches of the non-hot keys only
      val expectedN = (0L until 200000L by 20)
        .count(id => id % 3 == 0)
      assert(row.getLong(0) === expectedN)
      val expectedSum = (0L until 200000L by 20)
        .filter(id => id % 3 == 0).sum
      assert(row.getLong(1) === expectedSum)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
