package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval joins Spark's planner has no native strategy for.
  *
  * A point-in-interval predicate (`lo <= p AND p <= hi`) is a theta
  * join: Catalyst plans it as a broadcast nested loop (or worse, a
  * cartesian product) — every point against every interval, O(n·m)
  * compares however selective the predicate. The fix is the standard
  * range-bucketing technique (the public form of the range-join
  * optimization in Databricks/Photon and the interval-join in Flink):
  * quantize the domain into fixed-width buckets, key each point to
  * its bucket, EXPLODE each interval to every bucket it covers, and
  * equi-join on the bucket key with the exact predicate as a
  * residual filter. The equi-join hash-partitions both sides —
  * shuffle and probe are linear in |points| + Σ(span/width), and the
  * residual runs only within a bucket.
  *
  * `bucketWidth` trades explode fan-out (long intervals × narrow
  * buckets) against residual selectivity (wide buckets pack unrelated
  * points and intervals together). Pick it near the TYPICAL interval
  * span so most intervals explode to 1–2 rows.
  */
object RangeJoin {

  /** Inner point-in-interval join: every (point row × interval row)
    * pair with `points(pointCol) ∈ [loCol, hiCol]` (both ends
    * inclusive; null points/bounds drop — null never sits in an
    * interval). Both inputs keep all their columns; names must not
    * collide (the caller picks sides' schemas, as with any join).
    * Columns must be integral (day numbers, epoch seconds, SKs —
    * floor-division bucketing is exact on longs).
    */
  /** One interval exploding past this many buckets fails LOUDLY: it
    * means `bucketWidth` is wildly under the data's span scale (or a
    * corrupt interval spans eras) — silently materializing a
    * billion-row explode per bad row is the failure mode a 100 TB run
    * cannot afford to discover from an OOM.
    */
  val MaxBucketsPerInterval: Long = 4096L

  private def bucketOfCol(c: Column, bw: Long): Column =
    ((c - pmod(c, lit(bw))) / lit(bw)).cast("long")

  /** `sequence(loB, hiB)` with the fan-out guard: a span past
    * [[MaxBucketsPerInterval]] raises with the offending bounds in
    * the message instead of exploding.
    */
  private def guardedBuckets(loB: Column, hiB: Column): Column =
    explode(when(hiB - loB >= lit(MaxBucketsPerInterval),
      raise_error(concat(
        lit("RangeJoin: interval spans "),
        (hiB - loB + 1).cast("string"),
        lit(" buckets (> " + MaxBucketsPerInterval +
          ") — raise bucketWidth or quarantine the interval ["),
        loB.cast("string"), lit(", "), hiB.cast("string"), lit("]"))))
      .otherwise(sequence(loB, hiB)))

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be positive: $bucketWidth")
    // floor-div via floor(double division) would lose exactness past
    // 2^53; integer arithmetic only. pmod-corrected for negatives.
    def bucketOf(c: Column): Column = bucketOfCol(c, bucketWidth)
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__graft_bucket", bucketOf(col(pointCol).cast("long")))
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__graft_bucket",
        guardedBuckets(bucketOf(col(loCol).cast("long")),
          bucketOf(col(hiCol).cast("long"))))
    p.join(iv, "__graft_bucket")
      .filter(col(loCol) <= col(pointCol) && col(pointCol) <= col(hiCol))
      .drop("__graft_bucket")
  }

  /** Inner interval-OVERLAP join: every (left row × right row) pair
    * whose intervals intersect (`loA ≤ hiB AND loB ≤ hiA`, closed
    * ends). Same bucketization as [[pointInInterval]], but with BOTH
    * sides exploded a qualifying pair would meet in every shared
    * bucket — the OWNERSHIP rule keeps exactly one copy with no
    * `distinct` (no extra shuffle): a pair is emitted only in bucket
    * `max(bucket(loA), bucket(loB))`, the FIRST bucket both intervals
    * cover (each covers a contiguous bucket range containing its own
    * `lo`-bucket, and overlap guarantees the later `lo` precedes the
    * earlier `hi`). Column names must be disjoint across the sides.
    */
  def intervalOverlap(left: DataFrame, loA: String, hiA: String,
                      right: DataFrame, loB: String, hiB: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be positive: $bucketWidth")
    def bucketOf(c: Column): Column = bucketOfCol(c, bucketWidth)
    def explodeSide(df: DataFrame, lo: String, hi: String, b: String) =
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn(b, guardedBuckets(bucketOf(col(lo).cast("long")),
          bucketOf(col(hi).cast("long"))))
    val l = explodeSide(left, loA, hiA, "__graft_bl")
    val r = explodeSide(right, loB, hiB, "__graft_br")
    l.join(r, col("__graft_bl") === col("__graft_br") &&
        col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        col("__graft_bl") === greatest(bucketOf(col(loA).cast("long")),
          bucketOf(col(loB).cast("long"))))
      .drop("__graft_bl", "__graft_br")
  }
}
