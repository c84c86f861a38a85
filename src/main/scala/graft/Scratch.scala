package graft

import org.apache.spark.sql.functions._

/** Dev scratch profiler (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.sessionBuilder("scratch", "local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    time("warm scan")(docs.count())
    val hashed = pipeline.TextAnalysis.hashedShingleRows(docs, "text", "doc_id", 5)
    time("hashed shingle rows")(hashed.count())
    time("shingle rows+agg")(
      hashed.groupBy("id").agg(max("shingle")).count())
    time("groupBy 64 mins")(
      pipeline.MinHashLSH.signatures(docs, "text", "doc_id", 5, 64)
        .agg(max(element_at(col("sig"), 1))).count())
    time("sigs+banded")(
      pipeline.MinHashLSH.banded(
        pipeline.MinHashLSH.signatures(docs, "text", "doc_id", 5, 64), 16, 4)
        .count())
    time("full candidatePairs")(
      pipeline.MinHashLSH.candidatePairs(docs, "text", "doc_id").count())
    spark.stop()
  }
}
