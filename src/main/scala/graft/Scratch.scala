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
    // Solo-residency probe for a single registered query (bench config:
    // local[32], 32 shuffle partitions): min-of-N in a JVM that has run
    // nothing else, to separate real plan cost from bench-JVM residency.
    if (args.headOption.contains("solo")) {
      val name = args(1)
      val reps = if (args.length > 2) args(2).toInt else 3
      spark.stop()
      val s32 = Graft.sessionBuilder("scratch-solo", "local[32]", 32)
        .getOrCreate()
      s32.sparkContext.setLogLevel("WARN")
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(s32, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] solo $name rep: $t%6.2f s  rows=$n")
        s32.catalog.clearCache()
        t
      }
      println(f"[scratch] solo $name min=${times.min}%6.2f s spread=${times.max - times.min}%6.2f s")
      s32.stop()
      return
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
