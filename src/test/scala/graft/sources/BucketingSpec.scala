package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.{SparkSpec, Tables}

/** Bucketed+sorted tables must (a) change nothing about results and
  * (b) remove the shuffle from the join — the property that makes a
  * 100 TB fact-fact join feasible (each task reads bucket i of both
  * sides; no Exchange materializes either table). */
class BucketingSpec extends SparkSpec with BeforeAndAfterAll {

  private def tableLocation(table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))

  /** dropBucketed is the owning end of the table lifecycle: catalog entry
    * AND warehouse location must both be gone, so repeated `sbt test`
    * runs never accrete warehouse state. */
  override def afterAll(): Unit = {
    Seq("bkspec_orders", "bkspec_lineitem", "bkspec_layout", "bkspec_orphan")
      .foreach { t =>
        Bucketing.dropBucketed(spark, t)
        assert(!spark.catalog.tableExists(t), s"$t still in catalog")
        val loc = tableLocation(t)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(!fs.exists(loc), s"$t location survived drop: $loc")
      }
    super.afterAll()
  }

  test("writeBucketed recovers from an orphaned warehouse location") {
    // The round-6 failure shape: the location exists on disk but the
    // (in-memory) catalog has no entry — a fresh JVM over a previous
    // process's warehouse. saveAsTable alone dies with
    // LOCATION_ALREADY_EXISTS; writeBucketed must clear and proceed.
    val table = "bkspec_orphan"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = tableLocation(table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    val junk = fs.create(new org.apache.hadoop.fs.Path(loc, "stale-part"))
    junk.writeBytes("left behind by a dead process")
    junk.close()
    assert(fs.exists(loc) && !spark.catalog.tableExists(table))

    val orders = Tables.load(spark, sf(), "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(orders, table, "o_orderkey", 4)
    assert(spark.table(table).count() === orders.count())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(loc, "stale-part")),
      "stale file survived the hermetic rewrite")
  }

  test("sweepDeadBucketed removes dead pids' tables, never live ones") {
    // pid 2147483646 exceeds Linux's pid_max ceiling (4194304) → cannot
    // be a live process, so the sweep must treat its dir as garbage
    val dead = "graft_bk_sweepspec_p2147483646"
    val legacy = "graft_bk_sweepspec_7418e66b" // pre-pid-scheme name shape
    val live = s"graft_bk_sweepspec_p${ProcessHandle.current().pid()}"
    val fs = tableLocation(dead)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(tableLocation(dead))
    fs.mkdirs(tableLocation(legacy))
    Bucketing.writeBucketed(
      Tables.load(spark, sf(), "orders").select("o_orderkey"),
      live, "o_orderkey", 2)

    // within the grace window NOTHING foreign is deleted (a fresh dir's
    // owner may be invisible to this PID namespace)
    Bucketing.sweepDeadBucketed(spark)
    assert(fs.exists(tableLocation(dead)) && fs.exists(tableLocation(legacy)),
      "sweep deleted a dir younger than the grace window")

    // past the grace window: dead-pid and legacy dirs go, live stays
    Bucketing.sweepDeadBucketed(spark, graceMs = 0)
    assert(!fs.exists(tableLocation(dead)), "dead pid's location not swept")
    assert(!fs.exists(tableLocation(legacy)), "legacy location not swept")
    assert(spark.catalog.tableExists(live) && fs.exists(tableLocation(live)),
      "sweep deleted a LIVE process's table")
    Bucketing.dropBucketed(spark, live)
  }

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
