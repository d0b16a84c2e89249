package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated test lake.
  * On a cluster the same layout holds (one directory of parquet per
  * table); scans stay column-pruned + filter-pushed because every
  * operator selects through the declarative API.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet stores ts as TIMESTAMP(NANOS), which the vectorized
      // parquet reader rejects. `spark.sql.legacy.parquet.nanosAsLong` is
      // set by every session builder (GraftSession / Verify / Bench / specs);
      // here the long nanos are truncated to microseconds with integer
      // division (ns magnitudes overflow double precision, so no
      // floating-point math). The lake's nanos DO carry sub-microsecond
      // precision; the truncation matches the DuckDB oracle because DuckDB
      // reads nano parquet as microsecond TIMESTAMP, truncating the same
      // way — equal only for non-negative epochs (spec-pinned: toward-zero
      // and floor division agree there).
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
