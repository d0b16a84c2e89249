package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent fact-merge semantics.
  *
  * The reference loads facts with `MERGE ... WHEN NOT MATCHED THEN
  * INSERT` on the declared grain (reference: src/gold/load_gold.py:
  * 1160-1180): re-running a load never duplicates a grain. On a lake
  * without a transactional MERGE primitive the same contract is a
  * left-anti join: keep every existing row, append only incoming rows
  * whose grain key is absent.
  *
  * Scale shape: the anti join shuffles on the grain key (or broadcasts
  * the existing key set when small); no full-table rewrite of the
  * existing side is implied — pair with MedallionSink partitioning so
  * only affected partitions rewrite.
  */
object Merge {

  def appendNewGrains(existing: DataFrame, incoming: DataFrame,
                      grain: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(grain.map(col): _*).distinct(),
        grain, "left_anti"))

  /** Incremental maintenance of a materialized JOIN view — the join
    * sibling of [[mergeAggregate]]'s aggregate IVM: given the stored
    * view `A ⋈ B` and upsert deltas on either (or both) sides, only
    * the join-key partitions a delta TOUCHES are recomputed; every
    * untouched view row is carried over verbatim. At 100 TB this is
    * the difference between rewriting a petabyte view nightly and
    * rewriting the handful of partitions that changed.
    *
    * Semantics: both sides are upserted on their primary keys (delta
    * row wins), then `touched = joinKeys(ΔA) ∪ joinKeys(ΔB ∪ the B
    * rows ΔB replaced — a dim UPDATE touches its old key's rows
    * too... here B's pk IS its join key in the star shape, so ΔB's
    * keys cover both versions); the new view is
    * `view ∖ touched ∪ (A' ⋈ B')|touched`. Every join shuffles on
    * the join key; the anti/semi prunes are key-only relations.
    *
    * `joinKey` must be B's primary key (the star-schema dim key):
    * that is what makes the touched-set complete under updates.
    */
  def maintainJoinView(view: DataFrame,
                       aOld: DataFrame, aDelta: DataFrame, aPk: Seq[String],
                       bOld: DataFrame, bDelta: DataFrame,
                       joinKey: String): DataFrame = {
    val touched = aDelta.select(col(joinKey))
      .unionByName(bDelta.select(col(joinKey)))
      .distinct()
    val aNew = aDelta.unionByName(
      aOld.join(aDelta.select(aPk.map(col): _*).distinct(), aPk, "left_anti"))
    val bNew = bDelta.unionByName(
      bOld.join(bDelta.select(col(joinKey)).distinct(), Seq(joinKey), "left_anti"))
    val keep = view.join(touched, Seq(joinKey), "left_anti")
    val recomputed = aNew.join(touched.hint("shuffle_hash"), Seq(joinKey), "left_semi")
      .join(bNew, Seq(joinKey))
    keep.unionByName(recomputed.select(view.columns.map(col): _*))
  }

  /** Cut-replacement load: delete-cut-then-insert, the reference's
    * partition reload (models/gold/cleanup_cut.sql + the dim_cut
    * audit): every existing row of a cut PRESENT IN the incoming
    * batch is dropped and replaced by the batch's rows; untouched
    * cuts pass through untouched. Idempotent — replaying the same
    * batch reproduces the same table.
    *
    * Scale shape: the anti join keys on the cut column only (the
    * distinct incoming cut set is tiny and broadcasts); rows of a cut
    * never need to be paired row-to-row like a grain merge. The
    * physical twin is MedallionSink.overwritePartitions (dynamic
    * partition overwrite — only the incoming cut directories
    * rewrite).
    */
  def replaceCut(existing: DataFrame, incoming: DataFrame,
                 cutCol: String): DataFrame = {
    // Null-safe equality: a NULL cut in the batch must replace the
    // existing NULL-cut rows too — a plain anti join would keep them
    // (null never equals null) and append duplicates beside them.
    val cuts = broadcast(incoming.select(col(cutCol).as("__graft_cut")).distinct())
    existing.join(cuts, existing(cutCol) <=> cuts("__graft_cut"), "left_anti")
      .unionByName(incoming)
  }

  /** Incremental aggregate maintenance: fold a batch's partial
    * aggregate into a stored rollup by grain-keyed summation — the
    * 100-TB pattern for always-fresh aggregates (COUNT partials merge
    * by SUM, SUM partials by SUM; both are associative and
    * commutative), so the rollup is all that is ever kept and raw
    * history is never re-scanned. Every non-key column of `stored`
    * must be such a mergeable partial; decimal sums keep the merge
    * order-free. The merged result equals the aggregate of the
    * concatenated inputs — the spec and the driver oracle pin exactly
    * that equality.
    *
    * Scale shape: one union (no materialization) + one shuffle keyed
    * on the rollup grain, sized by DISTINCT grains, not input rows.
    */
  def mergeAggregate(stored: DataFrame, incoming: DataFrame,
                     keys: Seq[String]): DataFrame = {
    val aggCols = stored.columns.filterNot(keys.contains).toSeq
    require(aggCols.nonEmpty, "mergeAggregate needs at least one aggregate column")
    val sums = aggCols.map(c => sum(col(c)).as(c))
    stored.unionByName(incoming)
      .groupBy(keys.map(col): _*)
      .agg(sums.head, sums.tail: _*)
  }
}
