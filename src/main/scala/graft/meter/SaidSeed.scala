package graft.meter

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic meter-id seeding (reference: core.clj:27-35): SHA-1 of a
  * stable host-identity string, interpreted as a *signed* two's-complement
  * BigInteger, mod 100000. Clojure's `mod` with a positive divisor is
  * non-negative, exactly matching `BigInteger.mod`, so the result is always
  * in [0, 99999] ("different SAIDs on different hosts, always the same SAID
  * on the same host", core.clj:28-30).
  *
  * Spark's built-in `sha1()` returns a hex string and has no 160-bit integral
  * type, so the digest→BigInteger→mod step is a small custom Catalyst
  * Expression (SURVEY §7.4). Interpreted eval is fine here: this runs once
  * per host string, never in a hot loop.
  */
object SaidSeed {
  val Mod: BigInteger = BigInteger.valueOf(100000L)

  def saidSeed(hostId: String): Int = {
    val digest = MessageDigest.getInstance("SHA-1")
      .digest(hostId.getBytes("UTF-8"))
    new BigInteger(digest).mod(Mod).intValue
  }

  /** Column form: said_seed(host_id). */
  def said_seed(c: Column): Column =
    bridge.column(SaidSeedExpr(bridge.expression(c.cast("string"))))

  /** Register for the SQL entry point: `SELECT said_seed(host)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "said_seed",
      exprs => SaidSeedExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, StringType)),
      "scala_udf")
}

/** Input must be StringType; [[SaidSeed.said_seed]] inserts the cast. */
case class SaidSeedExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "said_seed"
  override protected def nullSafeEval(input: Any): Any =
    SaidSeed.saidSeed(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): SaidSeedExpr =
    copy(child = newChild)
}
