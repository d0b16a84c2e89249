package graft
object ScratchProf {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Recsys
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val raw = Tables(spark, d, "lineitem").join(Tables(spark, d, "orders"),
      col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("o_custkey"), col("l_partkey"))
    val inter = Recsys.interactions(raw, "o_custkey", "l_partkey", 1000).localCheckpoint(false)
    inter.count()
    val m = classOf[Recsys.type].getDeclaredMethods.find(_.getName == "itemCosineFromInteractions").get
    m.setAccessible(true)
    for (pass <- 1 to 3) {
      tm(s"itemCosine pass$pass") {
        m.invoke(Recsys, inter, Int.box(10), Int.box(2))
          .asInstanceOf[org.apache.spark.sql.DataFrame]
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
