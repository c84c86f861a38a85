package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.{SparkSpec, Tables}

/** CSV / JSONL round-trips against the parquet fixtures: same rows, schema
  * stated up front (never inferred), corrupt rows surfaced not dropped. */
class FormatsSpec extends SparkSpec {

  private lazy val nation = Tables.load(spark, sf(), "nation")

  test("csv round-trip preserves rows and schema") {
    val dir = tmpDir("graft_csv")
    Formats.writeCsv(nation, dir)
    val back = Formats.readCsv(spark, dir, nation.schema)
    assert(back.schema == nation.schema)
    assert(back.exceptAll(nation).count() == 0 &&
      nation.exceptAll(back).count() == 0)
  }

  test("jsonl round-trip preserves rows") {
    val dir = tmpDir("graft_jsonl")
    Formats.writeJsonl(nation, dir)
    val back = Formats.readJsonl(spark, dir, nation.schema)
    assert(back.exceptAll(nation).count() == 0 &&
      nation.exceptAll(back).count() == 0)
  }

  test("orc round-trip preserves rows and schema, filters push down") {
    val dir = tmpDir("graft_orc")
    Formats.writeOrc(nation, dir)
    val back = Formats.readOrc(spark, dir, nation.schema)
    assert(back.schema == nation.schema)
    assert(back.exceptAll(nation).count() == 0 &&
      nation.exceptAll(back).count() == 0)
    // the same pushdown contract the parquet scans get
    val p = back.filter(col("n_nationkey") === 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]"),
      s"ORC scan did not push the filter:\n$p")
  }

  test("malformed csv rows land in _corrupt_record, valid rows survive") {
    val dir = tmpDir("graft_bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "k,v\n1,a\nnot_an_int,b\n2,c\n")
    val schema = StructType(Seq(
      StructField("k", org.apache.spark.sql.types.IntegerType),
      StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark refuses to filter _corrupt_record straight off the raw file
    // scan (the column only exists during parse) — materialize first.
    val got = Formats.readCsv(spark, dir, schema).cache()
    got.count()
    assert(got.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(got.filter(col("k").isNotNull).count() == 2)
  }
}
