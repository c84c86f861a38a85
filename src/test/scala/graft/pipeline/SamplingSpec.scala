package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The properties that make hash-based sampling trustworthy: disjoint and
  * exhaustive splits, stability under repartitioning and corpus growth,
  * and exact per-stratum counts. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf(), "documents")

  test("splitByHash: disjoint, exhaustive, roughly proportional") {
    val split = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count())
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > total * 0.75 && counts("train") < total * 0.85)
    assert(counts("val") > total * 0.07 && counts("val") < total * 0.13)
  }

  test("split membership is stable under repartition and corpus growth") {
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.splitByHash(df, "doc_id", Seq("train" -> 0.5, "test" -> 0.5))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = assign(docs)
    val repart = assign(docs.repartition(17))
    assert(base == repart, "repartition changed split membership")
    // growth: assigning over half the corpus agrees with the full corpus
    val half = assign(docs.filter(col("doc_id") % 2 === 0))
    assert(half.forall { case (id, s) => base(id) == s },
      "corpus growth moved existing rows across splits")
  }

  test("sampleByHash returns the same rows every run") {
    val a = Sampling.sampleByHash(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByHash(docs.repartition(7), "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size > docs.count() * 0.15 && a.size < docs.count() * 0.25)
  }

  test("stratified keeps exactly ceil(frac * n) per stratum") {
    val labeled = docs.withColumn("lang",
      TextAnalysis.langGuess(col("text")))
    val perStratum = labeled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratified(labeled, "lang", "doc_id", 0.1)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (lang, n) =>
      assert(sampled(lang) == math.ceil(n * 0.1).toLong,
        s"stratum $lang: ${sampled(lang)} of $n")
    }
  }

  test("stratified: sha and xxhash bucket families both give exact quotas, stable membership") {
    for (fn <- Seq(Sampling.hashBucket _, Sampling.shaBucket _)) {
      val a = Sampling.stratified(docs, "lang", "doc_id", 0.2, bucketFn = fn)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val b = Sampling.stratified(docs.repartition(13), "lang", "doc_id", 0.2,
        bucketFn = fn)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a == b, "membership changed under repartition")
      val quotas = docs.groupBy("lang").count().collect()
        .map(r => math.ceil(r.getLong(1) * 0.2).toLong).sum
      assert(a.size.toLong == quotas)
    }
  }

  test("stratified two-phase selection equals the full-sort reference form") {
    for {
      fn <- Seq(Sampling.hashBucket _, Sampling.shaBucket _)
      frac <- Seq(0.07, 0.2, 1.0)
    } {
      val twoPhase = Sampling.stratified(docs, "lang", "doc_id", frac,
        bucketFn = fn).select("doc_id").collect().map(_.getLong(0)).toSet
      val bySort = Sampling.stratifiedBySort(docs, "lang", "doc_id", frac,
        bucketFn = fn).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(twoPhase == bySort, s"divergence at fraction $frac")
    }
  }

  test("stratified: hot stratum is never ranked whole — windows see only " +
      "histogram rows or the threshold bucket") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // one giant stratum: the exact shape that made the old form a
    // single-task sort
    val skewed = spark.range(0, 50000)
      .selectExpr("'hot' AS lang", "id AS doc_id")
    val out = Sampling.stratified(skewed, "lang", "doc_id", 0.1)
    assert(out.count() === 5000)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      // prefix-sum/threshold windows run over the bucket HISTOGRAM (an
      // aggregate: ≤ #buckets rows per stratum) …
      val overHistogram = w.child.collectFirst { case a: Aggregate => a }
      // … and the ranking window partitions by (stratum, BUCKET), so a
      // hot stratum splits across ~#buckets window groups
      val fineGrained = w.partitionSpec.exists(
        _.references.exists(_.name == "_bkt"))
      assert(overHistogram.nonEmpty || fineGrained,
        s"window over unbounded per-stratum input:\n$w")
    }
  }

  test("weightedSample: inclusion tracks weight, deterministic, heap-not-sort plan") {
    import spark.implicits._
    // 500 heavy rows (w=100) among 4500 light rows (w=1): with k=250, a
    // weight-proportional draw takes overwhelmingly from the heavy group
    val df = spark.range(5000L).select(col("id").as("key"),
      when(col("id") < 500, 100L).otherwise(1L).as("w"))
    val picked = Sampling.weightedSample(df, "key", "w", k = 250)
      .collect().map(_.getLong(0))
    val heavy = picked.count(_ < 500)
    // heavy group is 10% of rows but ~92% of total weight; require a
    // clear majority (an unweighted draw would give ~10%)
    assert(heavy > 200, s"only $heavy/250 picks from the heavy group")
    // determinism: same rows, same order, every run
    val again = Sampling.weightedSample(df, "key", "w", k = 250)
      .collect().map(_.getLong(0))
    assert(picked.toSeq === again.toSeq)
    // plan: global top-k must be a TakeOrderedAndProject (per-partition
    // heap + driver merge of k), never a full global sort
    val plan = Sampling.weightedSample(df, "key", "w", k = 250)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k in:\n$plan")
  }
}
