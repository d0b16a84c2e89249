package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series regularization: a reporting grid with NO missing slots.
  *
  * The reference's fct_boardings_30m only materializes observed slots;
  * every downstream consumer (the demand curves in docs/queries/01)
  * then needs the empty slots back. This operator materializes the
  * full day × 48-slot grid, zero-fills counts, and carries the last
  * observed aggregate forward (LOCF) for gauge-style measures.
  */
object TimeSeries {

  private val money: Column => Column = c =>
    graft.expressions.Kernels.toDecimal(c.cast("double"), 18, 2)

  /** Aggregate `events` per (day, 30-minute slot), then expand to the
    * complete grid over the observed days: absent slots appear with
    * `n_events = 0`, `value_sum` NULL, and `value_locf` = the day's
    * last preceding observed `value_sum` (last-observation-carried-
    * forward; NULL before the day's first observation).
    *
    * Scale shape: the only fact-sized operation is the (day, slot)
    * partial aggregate — one shuffle. The grid is |days| × 48 rows
    * (sequence + explode, no driver loop), the fill join is keyed on
    * (day, slot) over post-aggregate data, and the LOCF window
    * partitions by day over ≤ 48 rows — never a fact-level window.
    */
  def gapFill30m(events: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val ev = events.filter(col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"),
        graft.functions.Temporal.time30mSk(col(tsCol)).as("slot"),
        col(valueCol).as("__v"))
    val observed = ev.groupBy(col("day"), col("slot"))
      .agg(count(lit(1)).as("n_events"),
        sum(money(col("__v"))).cast("double").as("value_sum"))
    val grid = ev.select(col("day")).distinct()
      .select(col("day"), explode(sequence(lit(0), lit(47))).as("slot"))
    val locfW = Window.partitionBy(col("day")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq("day", "slot"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("value_locf", last(col("value_sum"), ignoreNulls = true).over(locfW))
  }
}
