package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Contract tests for [[TopKGenAgg]] — the boxed-comparator twin of
  * [[TopKPairsAgg]] for arbitrary orderable types — and the
  * analysis-time type lock the primitive aggregate now enforces. */
class TopKGenSpec extends SparkSpec {

  test("string-ord selection matches the row_number window face") {
    import spark.implicits._
    // the userCoEdges cap shape: per group, first k members by
    // (sha2(id), id) — gen aggregate vs the window formulation
    val df = (1L to 200L).map(u => (u % 4, u)).toDF("g", "id")
      .withColumn("h", sha2(col("id").cast("string"), 256))
    val viaAgg = df.groupBy("g")
      .agg(TopK.topk_gen(col("h"), col("id"), 5).as("tk"))
      .select(col("g"), explode(col("tk")).as("m"))
      .select(col("g"), col("m.ord").as("h"), col("m.id").as("id"))
    val viaWin = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("h"), col("id"))))
      .filter(col("rn") <= 5).select("g", "h", "id")
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty)
  }

  test("desc doubles: NaN sorts first, exactly like the window") {
    import spark.implicits._
    val df = Seq((1L, 0.5, 10L), (1L, Double.NaN, 11L), (1L, 0.9, 12L),
      (1L, Double.NaN, 9L), (1L, 0.1, 13L)).toDF("g", "s", "id")
    val got = df.groupBy("g")
      .agg(TopK.topk_gen(col("s"), col("id"), 3, asc = false).as("tk"))
      .select(explode(col("tk")).as("m"))
      .select(col("m.id")).as[Long].collect().toSeq
    // Spark window desc order: NaN (largest) first, id-asc ties → 9, 11
    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("id"))))
      .filter(col("rn") <= 3).orderBy("rn").select("id").as[Long]
      .collect().toSeq
    assert(got === win && got === Seq(9L, 11L, 12L))
  }

  test("primitive topk_pairs drops NaN ords instead") {
    import spark.implicits._
    val got = Seq((1L, Double.NaN, 9L), (1L, 0.2, 10L), (1L, 0.7, 11L))
      .toDF("g", "s", "id").groupBy("g")
      .agg(TopK.topk_pairs(col("s"), col("id"), 2, asc = false).as("tk"))
      .select(explode(col("tk")).as("m"))
      .select(col("m.id")).as[Long].collect().toSeq
    assert(got === Seq(11L, 10L))
  }

  test("merge across partitions round-trips string values (serialize path)") {
    import spark.implicits._
    // force many input partitions so partial buffers serialize + merge
    val df = spark.range(0, 300).repartition(8)
      .select(lit(0L).as("g"), col("id"),
        sha2(col("id").cast("string"), 256).as("h"))
    val got = df.groupBy("g")
      .agg(TopK.topk_gen(col("h"), col("id"), 7).as("tk"))
      .select(explode(col("tk")).as("m")).select(col("m.id")).as[Long]
      .collect().toSeq
    val exp = (0L until 300L)
      .sortBy(u => (java.security.MessageDigest.getInstance("SHA-256")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, u))
      .take(7)
    assert(got === exp)
  }

  test("exact duplicates collapse; same id with different ord kept") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("c", 2L))
      .toDF("h", "id").withColumn("g", lit(0))
    val got = df.groupBy("g")
      .agg(TopK.topk_gen(col("h"), col("id"), 10).as("tk"))
      .select(explode(col("tk")).as("m"))
      .select(col("m.ord"), col("m.id")).as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 1L), ("b", 1L), ("c", 2L)))
  }

  test("TopKGenBuf.dropped is exact: duplicates never set it, a k+1-th distinct pair does") {
    val cmp: Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    }
    // fill to k with re-offered duplicates: no drop recorded
    val b = new TopKGenBuf(2, cmp, cmp)
    b.insert(1L, 1L); b.insert(2L, 2L)
    b.insert(1L, 1L); b.insert(2L, 2L)
    assert(!b.dropped && b.size == 2)
    // a strictly-worse distinct pair on a full buffer IS a drop
    b.insert(3L, 3L)
    assert(b.dropped && b.size == 2)
    // displacement path: admitting a better pair drops the old k-th
    val d = new TopKGenBuf(2, cmp, cmp)
    d.insert(2L, 2L); d.insert(3L, 3L)
    assert(!d.dropped)
    d.insert(1L, 1L)
    assert(d.dropped && d.ords.take(2).toSeq == Seq(1L, 2L))
  }

  test("topk_pairs rejects non-(double, bigint) inputs at analysis time") {
    import spark.implicits._
    val df = Seq(("x", "i1")).toDF("s", "id").withColumn("g", lit(0))
    val err = intercept[Exception] {
      df.groupBy("g")
        .agg(TopK.topk_pairs(col("s"), col("id"), 3).as("tk"))
        .collect()
    }
    assert(err.getMessage.contains("DOUBLE") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
