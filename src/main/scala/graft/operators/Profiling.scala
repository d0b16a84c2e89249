package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution profiling — the ANALYZE-style statistics a lake load
  * publishes next to row counts (reference: build_catalog.py's row
  * accounting, widened to value distributions; the scalar-stats twin
  * is `table_profile_events`, the constant-memory one `sketch_profile`).
  */
object Profiling {

  /** Equi-width histogram of a numeric column in two passes: a 1-row
    * min/max aggregate broadcast over the scan, the bucket index
    * computed by pure arithmetic — `floor((v - mn) / ((mx - mn) / k))`
    * clamped so `v == mx` lands in the last bucket — then one
    * partial-aggregable shuffle on ≤ k bucket keys. Every op is
    * engine-exact (IEEE subtract/divide/floor), so an oracle replays
    * the exact bucket assignment; no sampling, no sketch.
    *
    * A degenerate column (mx == mn) collapses into bucket 0 instead
    * of dividing by zero.
    */
  def histogram(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"histogram needs at least one bucket: $k")
    val v = col(valueCol)
    val rows = df.filter(v.isNotNull)
    val bounds = rows.agg(min(v).as("mn"), max(v).as("mx"))
    val width = (col("mx") - col("mn")) / k
    val bucket = when(col("mx") === col("mn"), lit(0))
      .otherwise(least(lit(k - 1), floor((v - col("mn")) / width).cast("int")))
    rows.crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(v).as("bucket_min"), max(v).as("bucket_max"))
  }
}
