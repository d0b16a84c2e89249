package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit across a star schema.
  *
  * The reference asserts row-count contracts per load
  * (valid+invalid == read, catalog row counts); the FK edges of its
  * constellation are only enforced implicitly by the load order. This
  * operator measures them: per relationship, how many fact rows carry
  * a NULL FK and how many carry a key the dimension does not have
  * (orphans) — the audit every warehouse runs after an out-of-order
  * or partial load.
  *
  * Scale shape: per edge ONE join (dim side deduped to its key —
  * broadcast while small, co-keyed shuffle at scale) collapsing into
  * a 1-row aggregate (map-side partials; the single-partition
  * exchange moves one row per task). No collect, no count() actions —
  * the result is a lazy 1-row frame per edge, unioned.
  */
object Audit {

  /** One audit row for the edge `fact.fk -> dim.dimKey`. */
  def fkIntegrity(fact: DataFrame, fk: String, dim: DataFrame, dimKey: String,
                  relationship: String): DataFrame = {
    val d = dim.select(col(dimKey).as("__dk")).distinct()
    fact.select(col(fk).as("__fk"))
      .join(d, col("__fk") === col("__dk"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("__fk").isNull, 1)).as("n_null_fk"),
        count(when(col("__fk").isNotNull && col("__dk").isNull, 1)).as("n_orphans"))
      .select(lit(relationship).as("relationship"),
        col("n_rows"), col("n_null_fk"), col("n_orphans"),
        (lit(100.0) * col("n_orphans") / col("n_rows")).as("orphan_pct"))
  }

  /** Audit a set of edges: (fact, fk, dim, dimKey, name) per edge. */
  def fkIntegrityAll(edges: Seq[(DataFrame, String, DataFrame, String, String)]): DataFrame =
    edges.map { case (f, fk, d, dk, n) => fkIntegrity(f, fk, d, dk, n) }
      .reduce(_ unionByName _)

  /** Bucketed reconciliation between two keyed snapshots (replica
    * check, post-migration diff, loader regression): each side
    * reduces to `nBuckets` rows of (row count, order-free identity
    * checksum, exact DECIMAL measure sum) — the per-bucket hash is a
    * SUM of md5-derived 32-bit integers, so it is associative across
    * 1000 executors and replayable by any engine with md5 — then ONE
    * tiny full-outer join of the two panels flags the buckets that
    * differ. Divergence localizes to a bucket (re-scan only that key
    * range), and the data itself never moves: total shuffle is
    * 2·nBuckets rows.
    *
    * Identity digest covers the key and `hashCols` rendered through
    * an explicit NULL sentinel (concat_ws would silently collapse
    * NULL columns); `measureCol` is reconciled as an exact decimal
    * sum rather than through the digest (float-to-string rendering is
    * engine-specific; decimal sums are not).
    *
    * The identity checksum is DOUBLE-STRANDED: an additive SUM of the
    * 32-bit digests plus an order-free XOR of the 60-bit digests
    * ([[Sampling.md5Long60]]). Either alone can be fooled by
    * compensating edits inside one bucket (two rows swapping their
    * hash-column values cancels in a sum; an even number of identical
    * edits cancels in an XOR) — fooling BOTH simultaneously requires
    * edits that preserve an additive 32-bit invariant and a 60-bit
    * XOR invariant at once, which no natural data drift does. Both
    * strands stay associative/commutative, so the panel remains one
    * partial-aggregatable pass.
    */
  def tableDiff(a: DataFrame, b: DataFrame, keyCol: String,
                hashCols: Seq[String], measureCol: String,
                nBuckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be positive")
    def panel(df: DataFrame, suffix: String): DataFrame = {
      val digest32 = Sampling.md5Long32((keyCol +: hashCols).map(col))
      val digest60 = Sampling.md5Long60((keyCol +: hashCols).map(col))
      val bucket = pmod(Sampling.md5Long32(Seq(col(keyCol))), lit(nBuckets))
      df.withColumn("__graft_d60", digest60)
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as(s"n_rows_$suffix"),
          sum(digest32).as(s"checksum_$suffix"),
          expr("bit_xor(__graft_d60)").as(s"xor_$suffix"),
          sum(graft.expressions.Kernels.toDecimal(col(measureCol).cast("double"), 28, 6)).as(s"measure_sum_$suffix"))
    }
    // ≤ nBuckets rows per side, ≤ 1 row per key: shuffled-hash keeps
    // the tiny full-outer sort-free (the Cdc.snapshotDiff steering).
    panel(a, "a").hint("shuffle_hash").join(panel(b, "b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_rows_a"), lit(0L)).as("n_rows_a"),
        coalesce(col("n_rows_b"), lit(0L)).as("n_rows_b"),
        col("checksum_a"), col("checksum_b"),
        col("xor_a"), col("xor_b"),
        col("measure_sum_a").cast("double").as("measure_sum_a"),
        col("measure_sum_b").cast("double").as("measure_sum_b"),
        (coalesce(col("n_rows_a"), lit(0L)) === coalesce(col("n_rows_b"), lit(0L)) &&
          col("checksum_a") <=> col("checksum_b") &&
          col("xor_a") <=> col("xor_b") &&
          col("measure_sum_a") <=> col("measure_sum_b")).as("is_match"))
  }
}
