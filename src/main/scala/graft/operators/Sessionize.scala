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
        coalesce(round(sum(col(valueCol).cast(DecimalType(18, 2))), 2), lit(0))
          .cast("double").as("value_sum"))
  }
}
