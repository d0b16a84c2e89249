package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordered prefix sum — the primitive behind
  * cumulative-share / Pareto curves, global row numbering, and any
  * "running total over the WHOLE relation" ask that naive SQL writes
  * as `SUM(...) OVER (ORDER BY …)` — a single-partition window that
  * funnels the entire table through one task at 100 TB.
  *
  * Two-phase instead: range-partition on the order key (each task
  * holds one contiguous key range), local running sums inside each
  * partition, then a per-partition totals panel (≤ #partitions rows
  * — the ONLY single-partition window, benign by the house rule)
  * turns into broadcast offsets added back to every local prefix.
  * The result is identical to the global window for any input whose
  * composite order key is UNIQUE (peers would make "prefix" itself
  * ill-defined); range boundaries come from sampling, but with a
  * unique key the prefix at each row is layout-independent.
  *
  * Emits `prefix_sum` (running total of `valueCol` in `orderCols`
  * order, the current row included) and `row_rank` (1-based global
  * position — ROW_NUMBER without a global window).
  *
  * Sum `valueCol` in an EXACT type (integer/DECIMAL — the house
  * convention for money): the per-partition offset totals reduce in
  * arbitrary order, which is only bit-identical to a sequential scan
  * when addition is associative. IEEE doubles would drift in the
  * last ulp between this plan and a naive window.
  */
object PrefixSum {

  def globalOrdered(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                    nRangeParts: Int = 32): DataFrame =
    globalOrderedN(df, orderCols, Seq(valueCol), nRangeParts)
      .withColumnRenamed(s"prefix_$valueCol", "prefix_sum")

  /** Distributed global ordered prefix MAX — the running-maximum
    * sibling of [[globalOrderedN]] (same two-phase shape: range
    * partition, local running max, per-partition max panel turned
    * into broadcast offsets combined with `greatest`). Max is
    * associative, commutative and EXACT on every comparable type —
    * unlike the sum variant it is order-safe even on raw doubles.
    * Emits `prefix_max` (running max of `valueCol` in `orderCols`
    * order, current row included) and `row_rank`; the first range
    * partition's offset is NULL and `greatest` skips it.
    */
  def globalOrderedMax(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                       nRangeParts: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "globalOrderedMax needs an order")
    require(nRangeParts >= 1, s"nRangeParts=$nRangeParts must be positive")
    // same eager-materialization rule as globalOrderedN: both branches
    // must see one sampled range layout
    val local = df.repartitionByRange(nRangeParts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = local
      .withColumn("__local_n", count(lit(1)).over(w))
      .withColumn("__local_max", max(col(valueCol)).over(w))
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__part_n"), max(col(valueCol)).as("__part_max"))
      .select(col("__pid"),
        coalesce(sum(col("__part_n")).over(wp), lit(0L)).as("__offset_n"),
        max(col("__part_max")).over(wp).as("__offset_max"))
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn("prefix_max", greatest(col("__local_max"), col("__offset_max")))
      .withColumn("row_rank", (col("__local_n") + col("__offset_n")).cast("long"))
      .drop("__pid", "__local_n", "__local_max", "__offset_n", "__offset_max")
  }

  /** Multi-column variant: one ranged materialization, one offsets
    * panel, a running total per value column (`prefix_<name>`) — for
    * consumers that need several aligned prefixes over the same order
    * (e.g. a two-sample ECDF's old/new cumulative counts) without
    * paying the range partitioning twice.
    */
  def globalOrderedN(df: DataFrame, orderCols: Seq[Column], valueCols: Seq[String],
                     nRangeParts: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "globalOrdered needs an order")
    require(valueCols.nonEmpty, "globalOrderedN needs at least one value column")
    require(nRangeParts >= 1, s"nRangeParts=$nRangeParts must be positive")
    // EAGER: the local-prefix branch and the offsets branch must see
    // the SAME range boundaries — repartitionByRange samples its
    // bounds, so two independent evaluations could split differently
    // and pair offsets with the wrong partitions. localCheckpoint
    // materializes the ranged layout once; both branches reuse the
    // blocks (the lookupDim convention).
    val local = df.repartitionByRange(nRangeParts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = valueCols.zipWithIndex.foldLeft(
        local.withColumn("__local_n", count(lit(1)).over(w))) {
      case (d, (vc, i)) => d.withColumn(s"__local_sum_$i", sum(col(vc)).over(w))
    }
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__part_n"),
        valueCols.zipWithIndex.map { case (vc, i) =>
          sum(col(vc)).as(s"__part_sum_$i")
        }: _*)
      .select(col("__pid") +:
        coalesce(sum(col("__part_n")).over(wp), lit(0L)).as("__offset_n") +:
        valueCols.indices.map(i =>
          coalesce(sum(col(s"__part_sum_$i")).over(wp), lit(0)).as(s"__offset_sum_$i")): _*)
    val joined = withLocal.join(broadcast(offsets), "__pid")
    valueCols.zipWithIndex.foldLeft(joined) { case (d, (vc, i)) =>
        d.withColumn(s"prefix_$vc", col(s"__local_sum_$i") + col(s"__offset_sum_$i"))
      }
      .withColumn("row_rank", (col("__local_n") + col("__offset_n")).cast("long"))
      .drop("__pid" +: "__local_n" +: "__offset_n" +:
        valueCols.indices.flatMap(i =>
          Seq(s"__local_sum_$i", s"__offset_sum_$i")): _*)
  }
}
