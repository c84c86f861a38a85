package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Salting must be result-invariant: same totals, same joined rows — only
  * the shuffle-key distribution changes. Fixtures get a planted hot key. */
class SaltingSpec extends SparkSpec {

  // 90% of rows share key 7 — the pathological shape.
  private lazy val skewed = spark.range(0, 100000)
    .select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
      (col("id") % 1000).as("v"))

  test("saltedSum equals direct grouped sum on a hot key") {
    val direct = skewed.groupBy("k").agg(sum("v").as("total"))
      .orderBy("k").collect()
    val salted = Salting.saltedSum(skewed, Seq("k"), "v", salts = 16,
      resultCol = "total").orderBy("k").collect()
    assert(salted.sameElements(direct))
  }

  test("saltedJoin equals plain join, inner and left") {
    val dim = spark.range(0, 100000, 5).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
      val salted = Salting.saltedJoin(skewed, dim, "k", salts = 8, joinType = jt)
      assert(salted.columns.sorted.sameElements(plain.columns.sorted))
      assert(salted.count() == plain.count())
      assert(salted.exceptAll(plain).count() == 0 &&
        plain.exceptAll(salted).count() == 0, s"$jt join rows diverged")
    }
  }

  test("saltedSum plans two aggregate stages: (key, salt) then key") {
    val df = Salting.saltedSum(skewed, Seq("k"), "v", salts = 16,
      resultCol = "total")
    val p = df.queryExecution.executedPlan.toString
    // phase 1 shuffles on (k, _salt) — the hot key spread over 16 reducers —
    // phase 2 re-shuffles the 16 partials per key: exactly two hash exchanges
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"expected the two-phase shuffle shape:\n$p")
    assert(p.contains("_salt"), s"salt column absent from the plan:\n$p")
  }

  test("salted join on fixtures: lineitem x orders row-identical") {
    val li = Tables.load(spark, sf(), "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Salting.saltedJoin(li, ord, "l_orderkey", salts = 4)
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
  }
}
