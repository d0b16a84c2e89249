package graft

/** Scale-sweep timing harness for the §6 throughput-slope evidence:
  * times an explicit query list against an explicit data dir with a
  * fixed min-of-N protocol (default 2) and prints one JSON line.
  * Exists because [[Bench]]'s floor-retime pass compares against
  * PERF_BASELINE's sf0.1 floors — on a 10×/100× ScaleUp replica every
  * heavy query sits far above its sf0.1 floor BY DESIGN, so the
  * end-of-sweep retimes would fire everywhere and a slope sweep would
  * pay 4-6 passes per multi-minute query for nothing. Same noop sink,
  * same warmup discipline as Bench; min-of-N is the steady-state
  * number the slope table needs.
  *
  * Usage: runMain graft.SlopeBench <sfDir> <q1,q2,...> [passes=2]
  */
object SlopeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    require(passes >= 1, s"passes=$passes")
    val spark = GraftSession.get()
    // warmup outside the timed region: session/codegen + the dataset's
    // first-scan cost (footers, page cache), like Bench
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = names.map { n =>
      val ts = (1 to passes).map(_ => timeOnce(n))
      System.err.println(s"[slope] $n: ${ts.map(t => f"$t%.2f").mkString(", ")}")
      n -> BigDecimal(ts.min).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }
    val qj = rows.map { case (n, t) => s""""$n": $t""" }.mkString(", ")
    println(s"""{"sf_dir": "$sfDir", "passes": $passes, "queries": {$qj}}""")
  }
}
