package graft
object ScratchProf {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def tm(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime()-t0)/1e9
      println(f"[prof] $label $s%.2f s"); s
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // replicate geoNearestStop up to cands
    val q6 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e6)) / lit(1e6)
    val geo = SparkEntry.queries("geo_nearest_stop")
    for (pass <- 1 to 3) {
      tm(s"p$pass geo WINDOW (current)") { noop(geo(spark, d)) }
    }
    spark.stop()
  }
}
