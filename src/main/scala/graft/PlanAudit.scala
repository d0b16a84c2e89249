package graft

/** Physical-plan audit: for every registered query, print the counts
  * that matter at scale — shuffles (Exchange), broadcast vs sort-merge
  * joins, whole-stage-codegen coverage — and flag single-partition
  * global windows/sorts. Run with:
  *   sbt "runMain graft.PlanAudit [sfDir] [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = GraftSession.get()
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if only.isEmpty || only(name) =>
        try {
          val df = fn(spark, sfDir)
          // Execute the query's OWN plan first: under AQE the
          // pre-execution plan is the isFinalPlan=false skeleton with
          // no whole-stage-codegen markers, and a `.write` action
          // builds a separate QueryExecution, leaving this one
          // untouched. Running the executedPlan's RDD finalizes the
          // adaptive plan in place without collecting rows.
          df.queryExecution.executedPlan.execute().count()
          // the finalized adaptive treeString appends the initial plan
          // after the final one — count only the plan that actually ran
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          def n(p: String): Int = p.r.findAllIn(plan).length
          f"$name%-28s exch=${n("Exchange (hash|range)partitioning")}%2d single=${n("Exchange SinglePartition")}%2d " +
            f"bhj=${n("BroadcastHashJoin")}%2d smj=${n("SortMergeJoin")}%2d " +
            f"wsc=${n("\\*\\(\\d+\\)")}%3d"
        } catch {
          case e: Throwable => f"$name%-28s ERROR ${e.getMessage.take(80)}"
        }
    }
    rows.foreach(println)
    spark.stop()
  }
}
