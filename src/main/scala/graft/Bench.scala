package graft

/** Benchmark main: times every registered query at the SF directory in
  * `SPARK_GRAFT_SF_DIR`, forcing FULL evaluation through the `noop`
  * sink (a bare `.count()` would let Catalyst prune every computed
  * column and time only the scan). Prints one JSON line for the
  * driver's BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // JIT/codegen/session warmup outside the timed region — against
    // the SAME SF dir being benched, so the first timed query doesn't
    // absorb the dataset's first-scan cost (parquet footer reads, OS
    // page cache) that every other query then gets for free.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries("silver_cleanse_events")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    // Full per-query detail goes to a repo file; the stdout line must fit
    // the driver's bounded stdout-tail capture (measured 2000 chars — a
    // longer line gets head-truncated and fails its JSON parse), so it
    // carries only the slowest queries inline, trimmed to a hard budget.
    val detail = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$detail,"sf":"$sfDir"}"""
        .getBytes("UTF-8"))
    def line(k: Int): String = {
      val top = results.sortBy(-_._2).take(k).sortBy(_._1)
      val qs = top.map { case (n, v) => "\"" + n + "\":" + (math.rint(v * 1000) / 1000) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","n_queries":${results.size},"queries":$qs,"detail":"BENCH_DETAIL.json","sf":"$sfDir"}"""
    }
    val fit = (results.size to 1 by -1).view.map(line).find(_.length <= 1800)
    println(fit.getOrElse(line(1)))
    spark.stop()
  }
}
