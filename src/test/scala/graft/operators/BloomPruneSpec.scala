package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bloom semi-join reduction: exact join-invariance (false positives only
  * re-admit rows the join drops), real row reduction before the shuffle,
  * and a filter that evaluates map-side off the scan. */
class BloomPruneSpec extends SparkSpec {

  private lazy val lineitem = Tables.load(spark, sf(), "lineitem")
  private lazy val orders = Tables.load(spark, sf(), "orders")
    .filter(col("o_orderkey") % 37 === 0) // selective dim: ~3% of keys

  test("pruned join result is exactly the plain join result") {
    val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_custkey")
    val viaBloom = BloomPrune.prunedJoin(lineitem, orders,
        "l_orderkey", "o_orderkey", expectedItems = 10000)
      .select("l_orderkey", "l_linenumber", "o_custkey")
    assert(viaBloom.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(viaBloom).count() === 0)
    assert(plain.count() > 0, "fixture join was empty — test is vacuous")
  }

  test("the filter actually reduces the big side before the join") {
    val bloom = BloomPrune.keyFilter(orders, "o_orderkey",
      expectedItems = 10000)
    val total = lineitem.count()
    val kept = BloomPrune.pruned(lineitem, "l_orderkey", bloom).count()
    val trueMatches = lineitem
      .join(orders.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"),
        "left_semi").count()
    assert(kept >= trueMatches, "bloom dropped a true match")
    assert(kept < total / 2,
      s"bloom kept $kept of $total rows — no meaningful reduction")
  }

  test("pruning is a map-side filter — no shuffle or join added") {
    val bloom = BloomPrune.keyFilter(orders, "o_orderkey", 10000)
    val df = BloomPrune.pruned(lineitem.select("l_orderkey"), "l_orderkey", bloom)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bloom pruning shuffled:\n$p")
    assert(p.contains("might_contain"), s"filter missing from plan:\n$p")
  }
}
