package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

import graft.expressions.Kernels

/** Pre-join shuffle reduction.
  *
  * The standard 100-TB gap between "dim broadcasts" and "both sides
  * shuffle": a dim too big to broadcast whole whose KEY BLOOM (a few
  * MB at fpp 1%) still fits everywhere. Probing the bloom at the fact
  * scan drops the rows that cannot match BEFORE the join shuffle —
  * with a selective dim that is most of the fact's shuffle volume.
  * Spark injects this itself in some shuffle-join shapes (runtime
  * bloom filters); this operator makes the mechanism explicit and
  * usable where the optimizer will not reach (pre-staged blooms,
  * cross-job reuse, foreachBatch sinks).
  */
object Prejoin {

  /** Bloom over the dim's (long-castable) join keys: ONE aggregate
    * job on the dim side producing a fixed-size sketch — executors
    * build partial filters, the driver merges bit-or; no key list is
    * ever collected.
    *
    * Size `expectedItems` at or above the dim's true key count: the
    * filter still never false-negatives when undersized, but its
    * false-positive rate (wasted shuffle) degrades past `fpp`. When
    * the count is unknown, an `approx_count_distinct` pre-pass is
    * one cheap extra job.
    */
  def keyBloom(dim: DataFrame, keyCol: String, expectedItems: Long,
               fpp: Double = 0.01): Array[Byte] = {
    requireIntegralKey(dim, keyCol, "keyBloom")
    graft.expressions.BloomKernels.serialize(
      dim.filter(col(keyCol).isNotNull)
        .select(col(keyCol).cast("long").as(keyCol))
        .stat.bloomFilter(keyCol, expectedItems, fpp))
  }

  /** Prune the fact side of an INNER (or semi) join before its
    * shuffle: rows whose key is definitely absent from the dim drop
    * at the scan, inside whole-stage codegen. No false negatives —
    * `prune(fact) ⋈ dim == fact ⋈ dim` exactly; false positives only
    * cost their shuffle (fpp-bounded). NULL keys drop too (an inner
    * join never matches them). NOT for outer joins, where unmatched
    * fact rows must survive.
    */
  def pruneFactByDimKeys(fact: DataFrame, factKey: String,
                         dimKeyBloom: Array[Byte]): DataFrame = {
    requireIntegralKey(fact, factKey, "pruneFactByDimKeys")
    fact.filter(col(factKey).isNotNull &&
      Kernels.bloomMightContain(col(factKey).cast("long"), dimKeyBloom))
  }

  /** The no-false-negative contract holds only for keys whose long
    * cast is lossless. Anything else (a string "abc", a fractional
    * double) casts to NULL — or a truncated value — on BOTH the bloom
    * build and the probe, silently dropping matching fact rows.
    * Enforced here instead of trusting the caller to read the
    * scaladoc: fail loudly at plan-build time.
    */
  private def requireIntegralKey(df: DataFrame, keyCol: String, fn: String): Unit = {
    val dt: DataType = df.schema(keyCol).dataType
    require(
      dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType,
      s"Prejoin.$fn: key column '$keyCol' must be an integral type " +
        s"(byte/short/int/long), got $dt — a lossy long cast would NULL " +
        "or truncate keys on both build and probe, dropping matching rows")
  }
}
