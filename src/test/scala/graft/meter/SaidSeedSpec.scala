package graft.meter

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Pins said_seed (core.clj:27-35) against goldens computed independently
  * (python hashlib, signed big-endian interpretation, non-negative mod). */
class SaidSeedSpec extends SparkSpec {

  val goldens = Map(
    "host-0" -> 94285, "host-1" -> 95181, "host-2" -> 34087,
    "host-3" -> 50831, "host-4" -> 61621, "host-5" -> 26693,
    "host-6" -> 6794, "host-7" -> 4212, "host-8" -> 92125,
    "host-9" -> 20685, "" -> 48329, "a" -> 93176,
    "host-ff" -> 3591, "éclair" -> 57921)

  test("scala function matches independent goldens") {
    goldens.foreach { case (h, want) =>
      assert(SaidSeed.saidSeed(h) === want, s"for host '$h'")
    }
  }

  test("catalyst expression matches the scala function") {
    import spark.implicits._
    val df = goldens.keys.toSeq.toDF("host")
      .select(col("host"), SaidSeed.said_seed(col("host")).as("said"))
    df.collect().foreach { r =>
      assert(r.getInt(1) === goldens(r.getString(0)))
    }
  }

  test("SQL registration works") {
    import spark.implicits._
    SaidSeed.register(spark)
    Seq("host-0").toDF("h").createOrReplaceTempView("hosts_tmp")
    val got = spark.sql("SELECT said_seed(h) AS s FROM hosts_tmp")
      .collect()(0).getInt(0)
    assert(got === 94285)
  }

  test("property: deterministic and in [0, 99999]") {
    val prop = forAll { (s: String) =>
      val v = SaidSeed.saidSeed(s)
      v >= 0 && v < 100000 && v == SaidSeed.saidSeed(s)
    }
    assert(org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default, prop).passed)
  }
}
