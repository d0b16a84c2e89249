package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec}

/** Physical-plan audit: for every registered query, print the counts
  * that matter at scale — shuffles (Exchange), broadcast vs sort-merge
  * joins, whole-stage-codegen coverage — and flag single-partition
  * global exchanges. Run with:
  *   sbt "runMain graft.PlanAudit [sfDir] [queryName ...]"
  */
object PlanAudit {

  final case class Counts(var exch: Int = 0, var single: Int = 0, var bhj: Int = 0,
                          var smj: Int = 0, var cart: Int = 0, var wsc: Int = 0)

  /** Count nodes over the plan that ACTUALLY ran: descends into the
    * adaptive plan's current physical plan, materialized query stages
    * and subquery plans — string-counting the treeString instead would
    * either see the pre-execution skeleton (no codegen markers) or
    * double-count the appended initial-plan sections.
    */
  def count(plan: SparkPlan, c: Counts): Unit = {
    plan match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan, c); return
      case q: QueryStageExec => count(q.plan, c); return
      case s: ShuffleExchangeExec =>
        if (s.outputPartitioning == SinglePartition) c.single += 1 else c.exch += 1
      case _: BroadcastHashJoinExec => c.bhj += 1
      case _: SortMergeJoinExec => c.smj += 1
      case _: CartesianProductExec => c.cart += 1
      case _: WholeStageCodegenExec => c.wsc += 1
      case _ =>
    }
    plan.children.foreach(count(_, c))
    plan.subqueries.foreach(count(_, c))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = GraftSession.get()
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if only.isEmpty || only(name) =>
        try {
          val df = fn(spark, sfDir)
          // Execute the query's OWN plan first: under AQE the
          // pre-execution plan is the isFinalPlan=false skeleton, and
          // a `.write` action builds a separate QueryExecution,
          // leaving this one untouched. Running the executedPlan's
          // RDD finalizes the adaptive plan in place without
          // collecting rows.
          df.queryExecution.executedPlan.execute().count()
          val c = Counts()
          count(df.queryExecution.executedPlan, c)
          f"$name%-28s exch=${c.exch}%2d single=${c.single}%2d " +
            f"bhj=${c.bhj}%2d smj=${c.smj}%2d cart=${c.cart}%2d wsc=${c.wsc}%3d"
        } catch {
          case e: Throwable => f"$name%-28s ERROR ${e.toString.take(100)}"
        }
    }
    rows.foreach(println)
    spark.stop()
  }
}
