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

  /** Count-gated broadcast — the shared decision for checkpointed
    * relations whose stats the planner cannot see (a localCheckpoint
    * is a LogicalRDD with unknown size, so even a panel-sized side
    * plans a SortMergeJoin): broadcast when a KNOWN row count proves
    * the side small, fall back to the shuffle join at scale. One
    * threshold, one helper — Recsys (marginals/neighbors/seen-set),
    * Graph (per-round alive sets) and TextDedup (recall found-pairs)
    * all route through here.
    */
  private[graft] def broadcastIfSmall(df: DataFrame, rows: Long,
                                      maxRows: Long = 2000000L): DataFrame =
    if (rows <= maxRows) broadcast(df) else df

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

  /** Salted inner equi-join — the skew mitigation for a SHUFFLE join
    * whose key distribution is pathological (one key holding 10% of a
    * 100-TB fact melts a single reducer; `skew_hot_keys` is the
    * measurement that says so). The fact side gets a deterministic
    * salt in [0, saltN) — an md5-derived bucket of the whole row's
    * key + a caller-named discriminator column, so the assignment is
    * layout-stable and replayable, never `rand()` — and the bounded
    * side replicates each row saltN times (`explode(sequence)` inside
    * codegen). The join key becomes (key, salt): a hot key's rows
    * spread across saltN reducers instead of one.
    *
    * Output is EXACTLY the plain join's (salt dropped): every fact
    * row meets every matching right row in exactly one salt bucket.
    * Replication multiplies the right side's shuffle volume by saltN
    * — use it on the smaller-but-unbroadcastable side, and size saltN
    * to the measured hot-key multiple, not higher. (AQE's skew-join
    * split handles many cases after the fact; explicit salting keeps
    * working when a single KEY-VALUE — which AQE cannot split across
    * its sort groups in a grouped aggregation downstream — or a
    * non-AQE engine is involved.)
    */
  def saltedJoin(fact: DataFrame, right: DataFrame, keys: Seq[String],
                 saltDiscriminator: String, saltN: Int): DataFrame = {
    require(saltN >= 1, s"saltN=$saltN must be positive")
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    val salted = fact.withColumn("__graft_salt",
      pmod(Sampling.md5Long32((keys :+ saltDiscriminator).map(col)), lit(saltN))
        .cast("int"))
    val replicated = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    salted.join(replicated, keys :+ "__graft_salt")
      .drop("__graft_salt")
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
