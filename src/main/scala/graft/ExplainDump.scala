package graft

/** Dump `.explain("formatted")` for the named queries (or all) to
  * one file per query under an output directory — the plan evidence
  * committed as `plans/r{N}/<query>_{before,after}.txt`. Usage:
  *   sbt "runMain graft.ExplainDump <outDir> [query ...]"
  * Reads the SF dir from SPARK_GRAFT_SF_DIR like the other mains.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_plans")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n.txt"), txt.getBytes("UTF-8"))
        System.err.println(s"[explain] $n ok")
      } catch {
        case e: Throwable => System.err.println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
