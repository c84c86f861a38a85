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
}
