package graft
object ScratchProf {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Recsys
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
    val raw = Tables(spark, d, "lineitem").join(Tables(spark, d, "orders"),
      col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("o_custkey"), col("l_partkey"))
    val inter = Recsys.interactions(raw, "o_custkey", "l_partkey", 1000).localCheckpoint(false)
    inter.count()
    // replicate the serving tail's candidates relation
    val m = classOf[Recsys.type].getDeclaredMethods.find(_.getName == "itemCosineFromInteractions").get
    m.setAccessible(true)
    val neighbors = m.invoke(Recsys, inter, Int.box(10), Int.box(2))
      .asInstanceOf[org.apache.spark.sql.DataFrame].localCheckpoint(true)
    println("[prof] neighbors rows=" + neighbors.count())
    val cand0 = inter.join(broadcast(neighbors), Seq("item_id"))
    println("[prof] candidate rows=" + cand0.count())
    println("[prof] distinct (user, rec_item)=" + cand0
      .select(col("user_id"), col("neighbor_id")).distinct().count())
    for (p <- 1 to 3) {
      tm(s"p$p tail repartition-first (current)") {
        noop(cand0.repartition(col("user_id"))
          .groupBy(col("user_id"), col("neighbor_id").as("rec_item"))
          .agg((sum(round(col("cosine") * lit(1e6)).cast("long"))
              .cast("double") / lit(1e6)).as("score"),
            count(lit(1)).as("n_links")))
      }
      tm(s"p$p tail partial-agg (no repartition)") {
        noop(cand0
          .groupBy(col("user_id"), col("neighbor_id").as("rec_item"))
          .agg((sum(round(col("cosine") * lit(1e6)).cast("long"))
              .cast("double") / lit(1e6)).as("score"),
            count(lit(1)).as("n_links")))
      }
    }
    spark.stop()
  }
}
