package graft

/** Dev plan dumper (test scope, like Scratch): writes the
  * `explain("formatted")` output of named registry queries to files, so
  * optimization rounds can commit before/after plan evidence without
  * hand-copying console output.
  *
  * Usage: sbt "Test/runMain graft.PlanDump <outDir> <suffix> name1 name2 ..."
  * Writes <outDir>/<name>_<suffix>.txt per query. Building a DataFrame
  * does not execute it, but registry fns that run eager work (streaming
  * drains, fixpoint loops, collected codebooks) pay that work here.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.sessionBuilder("plandump", s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $name ($suffix): ${plan.length} chars")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[plandump] FAILED $name: $e")
      }
    }
    spark.stop()
  }
}
