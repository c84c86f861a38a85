package graft.meter

import graft.SparkSpec

/** Generator and rollup outputs must conform to the reference DDL schemas
  * (field names, order, and types) so any sink — Parquet or the Cassandra
  * connector — receives exactly the declared table shapes. */
class SchemasSpec extends SparkSpec {

  private val cfg = GenConfig(numMeters = 2, ticks = 120)

  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq

  private def expect(s: org.apache.spark.sql.types.StructType) =
    s.fields.map(f => (f.name, f.dataType)).toSeq

  test("transmissions match meter_samples") {
    assert(shape(MeterGen.transmissions(spark, cfg)) ==
      expect(Schemas.meterSamples))
  }

  test("second table matches meter_samples_second (32-bit joules)") {
    assert(shape(MeterGen.secondTable(spark, cfg)) ==
      expect(Schemas.meterSamplesSecond))
  }

  test("rollups match the counter tables (64-bit joules)") {
    val grains = Rollups.all(MeterGen.secondTable(spark, cfg))
    for (g <- Seq("minute", "hour", "day"))
      assert(shape(grains(g)) == expect(Schemas.meterSamplesRollup),
        s"grain $g diverges from DDL")
  }
}
