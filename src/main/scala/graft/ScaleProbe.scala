package graft

import org.apache.spark.sql.functions._

/** Dev scale probe (not part of the engine surface): ANN paths at 10× the
  * sf0.1 corpus — replicates the embeddings table with id offsets to 50k
  * vectors and times brute-force vs LSH vs IVF top-k for the same 20
  * queries. Results recorded in BASELINE.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.sessionBuilder("scaleprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val times = args.headOption.map(_.toInt).getOrElse(10)
    val nq = args.lift(1).map(_.toLong).getOrElse(20L)
    val big = (0 until times).map { i =>
      emb.select((col("vec_id") + lit(i * n)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionAll _).localCheckpoint(true)
    println(s"[probe] corpus = ${big.count()} vectors")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
    }
    time("brute")(pipeline.Similarity
      .bruteForceTopK(big, "vec_id", "embedding", _ < nq, 5).count())
    time("lsh")(pipeline.Similarity
      .lshTopK(big, "vec_id", "embedding", _ < nq, 5).count())
    time("ivf")(pipeline.Similarity
      .ivfTopK(big, "vec_id", "embedding", _ < nq, 5).count())
    // kernel path (nlist > 64): same nprobe/nlist = 1/4 scan fraction as
    // nlist=16/nprobe=4, but through the fixed-size-codegen IvfCellsExpr —
    // the configuration the literal path cannot compile.
    time("ivf256")(pipeline.Similarity
      .ivfTopK(big, "vec_id", "embedding", _ < nq, 5,
        nlist = 256, nprobe = 64).count())
    // two-level assignment at the same nlist/scan fraction: per-row
    // arithmetic ~(1+superProbe)·√nlist·d instead of nlist·d — the
    // kernel for nlist ≫ 10³.
    time("ivf256x2")(pipeline.Similarity
      .ivfTopK(big, "vec_id", "embedding", _ < nq, 5,
        nlist = 256, nprobe = 64, superProbe = 4).count())
    time("ivf1024x2")(pipeline.Similarity
      .ivfTopK(big, "vec_id", "embedding", _ < nq, 5,
        nlist = 1024, nprobe = 256, superProbe = 6).count())
    spark.stop()
  }
}
