package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Space-saving frequent items: the union-of-summaries guarantees the
  * operator's Scaladoc claims, exercised on a skewed constructed stream
  * spread over several partitions (so the per-partition summaries really
  * merge). */
class FrequentItemsSpec extends SparkSpec {

  test("spaceSaving: heavy keys guaranteed present, lower bounds honest") {
    val n = 10000L
    val capacity = 100
    // skew: key 7 takes half the stream, key 13 a sixth; the rest are
    // near-unique ids (each seen once)
    val df = spark.range(n).select(
      when(col("id") % 2 === 0, 7L)
        .when(col("id") % 3 === 0, 13L)
        .otherwise(col("id")).as("key"))
      .repartition(8)
    val truth = df.groupBy("key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = FrequentItems.spaceSaving(df, "key", capacity)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // containment: every key with true count > n/capacity is present
    val mustHave = truth.filter(_._2 > n / capacity).keySet
    assert(mustHave === Set(7L, 13L)) // the fixture is actually skewed
    assert(mustHave.subsetOf(got.keySet),
      s"missing guaranteed heavy keys: ${mustHave -- got.keySet}")
    // honesty: reported lower bounds never exceed the true count
    got.foreach { case (k, lb) =>
      assert(lb <= truth(k), s"key $k lower bound $lb > true ${truth(k)}")
    }
    // usefulness: ranking by lower bound puts the two heavy keys on top
    val top2 = got.toSeq.sortBy { case (k, lb) => (-lb, k) }.take(2).map(_._1)
    assert(top2.toSet === Set(7L, 13L))
    // bounded state: candidates ≤ partitions × capacity
    assert(got.size <= 8 * capacity)
  }

  test("spaceSaving: string keys keep their type and their guarantee") {
    val n = 6000L
    val capacity = 50
    // top-domains shape: two heavy domains over a long tail of unique ones
    val df = spark.range(n).select(
      when(col("id") % 2 === 0, lit("example.com"))
        .when(col("id") % 3 === 0, lit("example.org"))
        .otherwise(concat(lit("host-"), col("id"))).as("domain"))
      .repartition(4)
    val got = FrequentItems.spaceSaving(df, "domain", capacity)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = df.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mustHave = truth.filter(_._2 > n / capacity).keySet
    assert(mustHave === Set("example.com", "example.org"))
    assert(mustHave.subsetOf(got.keySet))
    got.foreach { case (k, lb) => assert(lb <= truth(k)) }
    val top2 = got.toSeq.sortBy { case (k, lb) => (-lb, k) }.take(2).map(_._1)
    assert(top2.toSet === mustHave)
  }

  test("cmsSketch: never undercounts any key, and sketches merge exactly") {
    val n = 8000L
    val df = spark.range(n).select(
      when(col("id") % 2 === 0, 7L)
        .when(col("id") % 3 === 0, 13L)
        .otherwise(col("id") % 500).as("key"))
      .repartition(4)
    val truth = df.groupBy("key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sketch = FrequentItems.cmsSketch(df, "key")
    val allKeys = df.select("key").distinct()
    val est = FrequentItems.cmsEstimate(sketch, allKeys, "key")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the CMS guarantee: estimates never fall below the true count
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"key $k undercounted: ${est(k)} < $c")
    }
    // bounded state: the sketch never exceeds depth x width rows
    assert(sketch.count() <= 4L * 512L)
    // mergeability: sketch(a union b) == counter-wise sum of the halves
    val a = df.filter(col("id") % 2 === 0)
    val b = df.filter(col("id") % 2 =!= 0)
    val merged = FrequentItems.cmsSketch(a, "key")
      .unionAll(FrequentItems.cmsSketch(b, "key"))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = sketch
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty)
  }

  test("exactTopK: ties break toward the smaller key, k respected") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L, 2L, 3L).toDF("k")
    val out = FrequentItems.exactTopK(df, "k", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L), (2L, 2L)))
  }
}
