package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Also emits
  * `etl_run_log.json` — per-query rows written, wall seconds, status —
  * the reference's etl_run_log observability as a first-class output
  * (reference: src/gold/load_gold.py run-log rows / ddl_gold.sql). */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (dev loop)
    val only = args.lift(2).map(_.split(',').toSet)
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    val runLog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // footer-metadata count of what actually landed, not a recompute
        val rows = spark.read.parquet(s"$outDir/$name").count()
        (name, rows, (System.nanoTime() - t0) / 1e9, "ok")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        (name, -1L, (System.nanoTime() - t0) / 1e9, "failed")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val logJson = runLog.map { case (n, rows, secs, status) =>
      // Double.toString is locale-independent (an f-interpolator "%.3f"
      // would emit a decimal COMMA under comma-decimal locales —
      // invalid JSON).
      val s3 = (math.rint(secs * 1000) / 1000).toString
      s"""{"query": ${q(n)}, "rows": $rows, "seconds": $s3, "status": ${q(status)}}"""
    }.mkString("[\n", ",\n", "\n]")
    Files.writeString(Paths.get(s"$outDir/etl_run_log.json"), logJson)
    spark.stop()
  }
}
