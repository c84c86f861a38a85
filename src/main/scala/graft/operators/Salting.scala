package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew mitigation (SURVEY §4.3). AQE's skew-join splitting already
  * re-plans sort-merge joins at runtime (enabled in Graft.sessionBuilder);
  * explicit salting remains the tool for the cases AQE cannot fix: a hash
  * aggregate whose partial (map-side) combine is defeated — distinct-style
  * aggregates or very wide partial state — and joins whose layout must stay
  * deterministic (bucketed tables) or whose hot key exceeds a single
  * executor even after splitting.
  *
  * Salts are assigned with `pmod(monotonically_increasing_id, salts)` —
  * deterministic for a given partitioning, shuffle-free and uniform
  * round-robin WITHIN each partition, which is exactly the property that
  * spreads one hot key's rows across reducers.
  */
object Salting {

  private def saltCol(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")

  /** Two-phase salted sum: groupBy(keys :+ salt) then groupBy(keys).
    * Identical totals to a direct grouped sum (sum associativity); the hot
    * key's first-phase state is spread over `salts` reducers. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int, resultCol: String): DataFrame = {
    val phase1 = df
      .withColumn("_salt", saltCol(salts))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(resultCol))
  }

  /** Salted equi-join: fact rows carry a salt in [0, salts); the dim side
    * (must be the smaller input — it is replicated `salts`×) explodes one
    * copy per salt value, so the shuffle key (key, salt) splits each hot
    * key into `salts` independent reducer groups. Row-identical to the
    * unsalted join for inner/left joins on a unique dim key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("_salt", saltCol(salts))
    val repDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
