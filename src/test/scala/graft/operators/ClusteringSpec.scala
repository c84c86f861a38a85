package graft.operators

import org.apache.spark.sql.Row

import graft.{SparkSpec, Tables}

/** Runtime semantics of Clustering: rows really are ordered inside each
  * partition, co-located by the partition key, and content is unchanged. */
class ClusteringSpec extends SparkSpec {

  test("clusterForScan: rows sorted within every partition, content intact") {
    val li = Tables.load(spark, sf(), "lineitem")
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS ship_us")
    val clustered = Clustering.clusterForScan(li,
      partCols = Seq("l_returnflag"),
      sortCols = Seq("l_returnflag", "ship_us", "l_orderkey",
        "l_linenumber"))

    // every partition is sorted by the sort key
    val unsortedPerPartition = clustered.rdd.mapPartitions { it =>
      val rows = it.toVector
      def key(r: Row) = (r.getString(2), r.getLong(3),
        r.getLong(0), r.getInt(1))
      val bad = rows.sliding(2).count {
        case Seq(a, b) =>
          Ordering[(String, Long, Long, Int)].gt(key(a), key(b))
        case _ => false
      }
      Iterator.single(bad)
    }.collect().sum
    assert(unsortedPerPartition === 0, "partition-local sort violated")

    // a partition key never spans two partitions (hash co-location)
    val spread = clustered.rdd.mapPartitionsWithIndex { (pid, it) =>
      it.map(r => (r.getString(2), pid))
    }.distinct().countByKey()
    assert(spread.values.forall(_ === 1L), s"keys span partitions: $spread")

    // content identical to the input (no rows gained/lost/changed)
    assert(clustered.exceptAll(li).count() === 0)
    assert(li.exceptAll(clustered).count() === 0)
  }

  test("zValue: matches reference Morton interleave, masks out-of-range input") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >>> i) & 1L) << (2 * i)) | (((b >>> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (65536L, 2L), (123456L, 7L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("a", "b")
      .select(Clustering.zValue(col("a"), col("b"), 16).as("z"))
      .as[Long].collect()
    got.zip(cases).foreach { case (z, (a, b)) =>
      assert(z === ref(a & 0xFFFF, b & 0xFFFF, 16), s"for ($a, $b)")
    }
  }

  test("z-order locality: every aligned run of 4 in z-sequence is a 2x2 tile") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 16x16 grid; sort by z; positions 4k..4k+3 must form an aligned 2x2
    // box — the block property that makes zone maps prune BOTH dimensions.
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val sorted = grid.toDF("x", "y")
      .withColumn("z", Clustering.zValue(col("x"), col("y"), 4))
      .orderBy("z")
      .as[(Long, Long, Long)].collect()
    assert(sorted.length === 256)
    sorted.grouped(4).foreach { tile =>
      val xs = tile.map(_._1); val ys = tile.map(_._2)
      assert(xs.max - xs.min <= 1 && ys.max - ys.min <= 1,
        s"z-run not a 2x2 tile: ${tile.mkString(",")}")
    }
  }
}
