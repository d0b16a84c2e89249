package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization (batch form).
  *
  * Classic distributed session assignment with no driver loop: mark
  * rows that open a new session (gap to the previous event of the
  * same user exceeds `gapSec`), then a running sum of the markers is
  * the session ordinal. One shuffle on the user key; both windows and
  * the final aggregate reuse the same hash partitioning.
  *
  * The streaming twin (graft.streaming.StreamOps.sessionize) computes
  * the same sessions incrementally with flatMapGroupsWithState.
  */
object Sessionize {

  def byGap(df: DataFrame, userCol: String, tsCol: String, idCol: String,
            valueCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Millisecond-precision gaps, matching the streaming twin's
    // epoch-ms comparison — a second-truncated gap would split
    // sub-second-offset sessions differently from the stream.
    val ms = unix_millis(col(tsCol))
    val newSession = when(
      lag(ms, 1).over(w).isNull || ms - lag(ms, 1).over(w) > gapSec * 1000L, 1).otherwise(0)
    df.withColumn("__graft_new_s", newSession)
      .withColumn("session_seq", sum(col("__graft_new_s")).over(run))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        coalesce(round(sum(graft.expressions.Kernels.toDecimal(col(valueCol).cast("double"), 18, 2)), 2), lit(0))
          .cast("double").as("value_sum"))
  }

  /** Same sessions through Spark's built-in `session_window` aggregate
    * (SessionWindowing + MergingSessionsExec — no window-function pass
    * at all, works identically in batch and streaming).
    *
    * Boundary alignment with [[byGap]]: byGap keeps two events in one
    * session when their ms-truncated gap is `<= gapSec*1000`, and
    * `session_window` merges inclusively too (an event starting
    * exactly at the previous window's end joins it — verified in
    * SamplingSketchSpec's boundary test), so the same `gapSec` aligns
    * the two rules exactly once the grouping timestamp is
    * ms-truncated like byGap's comparison; session bounds and sums
    * still aggregate the raw nano-precision column.
    */
  def byGapBuiltin(df: DataFrame, userCol: String, tsCol: String, idCol: String,
                   valueCol: String, gapSec: Long): DataFrame = {
    val tsMs = TempCol("ts_ms", df)
    val sessed = df
      .withColumn(tsMs, timestamp_millis(unix_millis(col(tsCol))))
      .groupBy(col(userCol),
        session_window(col(tsMs), s"${gapSec * 1000L} milliseconds").as(tsMs))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        coalesce(round(sum(graft.expressions.Kernels.toDecimal(col(valueCol).cast("double"), 18, 2)), 2), lit(0))
          .cast("double").as("value_sum"))
    // Sessions of one user are disjoint, so ranking by start time
    // reproduces byGap's running-sum ordinal; the window runs over the
    // aggregated sessions (a handful of rows per user), never raw events.
    val seqW = Window.partitionBy(col(userCol)).orderBy(col("session_start"))
    sessed
      .withColumn("session_seq", row_number().over(seqW).cast("long"))
      .select(col(userCol), col("session_seq"), col("session_start"),
        col("session_end"), col("n_events"), col("value_sum"))
  }
}
