package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated test lake.
  * On a cluster the same layout holds (one directory of parquet per
  * table); scans stay column-pruned + filter-pushed because every
  * operator selects through the declarative API.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The lake has shipped events.ts under two physical types across
      // data drops: TIMESTAMP(NANOS) (which the vectorized reader only
      // admits as a long via `spark.sql.legacy.parquet.nanosAsLong`,
      // set by every session builder) and plain TIMESTAMP(MICROS).
      // Adapt on the READ SCHEMA, not an assumption: long nanos are
      // truncated to microseconds with integer division (ns magnitudes
      // overflow double precision, so no floating-point math) — equal
      // to DuckDB's micro read only for non-negative epochs
      // (spec-pinned: toward-zero and floor division agree there) —
      // while a native timestamp passes through untouched (both
      // engines read the same micros; nothing to reconcile).
      // Either way ts is normalized to TIMESTAMP (LTZ): the nanos era
      // produced LTZ via timestamp_micros, and downstream operators
      // (unix_millis windows, watermarking) require it — an NTZ read
      // is reinterpreted under the session's pinned UTC zone, which
      // preserves the stored micros value exactly.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val fixed =
        if (raw.schema("ts").dataType == LongType)
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        else
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      fixed.select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
