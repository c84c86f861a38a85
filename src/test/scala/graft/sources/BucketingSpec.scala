package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed+sorted tables must (a) change nothing about results and
  * (b) remove the shuffle from the join — the property that makes a
  * 100 TB fact-fact join feasible (each task reads bucket i of both
  * sides; no Exchange materializes either table). */
class BucketingSpec extends SparkSpec {

  test("bucketed join: no Exchange on either side, results identical") {
    val dir = sf()
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    // force the SMJ path so the assertion sees the bucket-aligned plan,
    // not a broadcast that would hide it at this tiny SF
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
      val lineitem = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      Bucketing.writeBucketed(orders, "bkspec_orders", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem, "bkspec_lineitem", "l_orderkey", 4)

      val j = Bucketing.colocatedJoinOn(spark,
        "bkspec_orders", "bkspec_lineitem", "o_orderkey", "l_orderkey")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("Bucketed: true"),
        s"scan did not use the bucket layout:\n$p")

      // layout is invisible to results: same rows as the plain join
      val plain = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey"))
      assert(j.count() === plain.count())
      assert(j.exceptAll(plain).count() === 0 &&
        plain.exceptAll(j).count() === 0)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("writeBucketed lays out one file per bucket") {
    val dir = sf()
    Bucketing.writeBucketed(
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
      "bkspec_layout", "o_orderkey", 4)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED bkspec_layout")
      .filter(col("col_name") === "Location")
      .head().getString(1).stripPrefix("file:")
    val files = new java.io.File(loc).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    // repartition(numBuckets, key) aligns write tasks with bucket ids:
    // exactly numBuckets data files, not (input partitions × buckets)
    assert(files.length === 4,
      s"expected 4 bucket files, got:\n${files.map(_.getName).mkString("\n")}")
  }
}
