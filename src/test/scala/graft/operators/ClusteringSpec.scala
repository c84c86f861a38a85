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

  test("zValue: matches reference Morton interleave, saturates out-of-range input") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >>> i) & 1L) << (2 * i)) | (((b >>> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    def clamp(x: Long): Long = math.min(math.max(x, 0L), 65535L)
    val rnd = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (65536L, 2L), (123456L, 7L), (-3L, 70000L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("a", "b")
      .select(Clustering.zValue(col("a"), col("b"), 16).as("z"))
      .as[Long].collect()
    got.zip(cases).foreach { case (z, (a, b)) =>
      assert(z === ref(clamp(a), clamp(b), 16), s"for ($a, $b)")
    }
  }

  test("zValueN: 3-dim interleave matches reference, fits bit budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(ds: Seq[Long], bits: Int): Long =
      (for { (d, j) <- ds.zipWithIndex; i <- 0 until bits }
        yield ((d >>> i) & 1L) << (i * ds.size + j)).reduce(_ | _)
    val rnd = new scala.util.Random(11)
    val cases = Seq(Seq(0L, 0L, 0L), Seq(255L, 255L, 255L),
      Seq(1L, 2L, 4L)) ++
      Seq.fill(40)(Seq.fill(3)(rnd.nextInt(256).toLong))
    val got = cases.map(c => (c(0), c(1), c(2))).toDF("a", "b", "c")
      .select(Clustering.zValueN(
        Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .as[Long].collect()
    got.zip(cases).foreach { case (z, c) =>
      assert(z === ref(c, 8), s"for $c")
    }
    intercept[IllegalArgumentException] {
      Clustering.zValueN(Seq(col("a"), col("b"), col("c")), 22) // 66 bits
    }
  }

  test("z-order parquet layout: row-group zone maps prune a y-range " +
      "predicate that a single-column sort cannot") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    // 256×256 grid in pseudo-random arrival order, written as ONE file
    // with many small row groups; footers tell the truth about pruning.
    val arrival = spark.range(1L << 16)
      .selectExpr("id % 256 AS x", "id DIV 256 AS y", "id AS payload")
      .orderBy(xxhash64(col("payload")))
      .coalesce(1)
    val base = tmpDir("graft_zorder")
    def writeLayout(sorted: org.apache.spark.sql.DataFrame, name: String): String = {
      val dir = s"$base/$name"
      sorted.write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    }
    val zFile = writeLayout(arrival.sortWithinPartitions(
      Clustering.zValueN(Seq(col("x"), col("y")), 8)), "z")
    val xFile = writeLayout(arrival.sortWithinPartitions(col("x")), "xonly")
    // row groups whose [min,max] on `colName` intersect [lo, hi] — the
    // groups a zone-map scan must actually read
    def groups(file: String, colName: String, lo: Long, hi: Long): (Int, Int) = {
      import scala.jdk.CollectionConverters._
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file),
          spark.sessionState.newHadoopConf()))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val hit = blocks.count { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == colName).get.getStatistics
          val mn = st.genericGetMin.asInstanceOf[Number].longValue
          val mx = st.genericGetMax.asInstanceOf[Number].longValue
          mx >= lo && mn <= hi
        }
        (blocks.size, hit)
      } finally reader.close()
    }
    val (zTotal, zHit) = groups(zFile, "y", 0, 15)
    val (xTotal, xHit) = groups(xFile, "y", 0, 15)
    assert(zTotal >= 8, s"need several row groups for a meaningful test, got $zTotal")
    // single-column x-sort leaves y spanning ~the full range in nearly
    // every group: almost nothing can be skipped (a small tail group can
    // occasionally miss the range by accident)
    assert(xHit.toDouble / xTotal >= 0.9,
      s"x-sorted layout unexpectedly pruned: $xHit/$xTotal")
    // z-order confines the y-range to a fraction of the groups
    assert(zHit * 4 <= zTotal,
      s"z-order pruned too little: $zHit of $zTotal groups overlap y<=15")
    // and the pruned layout still returns exactly the right rows
    val got = spark.read.parquet(zFile).filter(col("y") <= 15)
    assert(got.count() === 256L * 16L)
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
