package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change-data-capture: diff two keyed snapshots of the same
  * entity into INSERT / DELETE / UPDATE change rows.
  *
  * The reference reloads its dimensional model wholesale per cut; at
  * 100 TB the load pipeline ships only what changed between snapshots
  * (the standard lake CDC shape when the source has no log — diff the
  * snapshots, feed the delta to the SCD2 / merge loaders).
  *
  * Scale shape: ONE co-keyed full-outer join — both sides hash-shuffle
  * on the key (AQE handles skew), change detection is a codegen'd
  * null-safe column compare, unchanged keys drop before anything else
  * sees them. Never a window, never a driver-side collect.
  */
object Cdc {

  /** Diff `cur` against `old` on `keys`.
    *
    * Emits one row per key whose presence or tracked attributes
    * changed: `change_type` INSERT (key only in `cur`), DELETE (only
    * in `old`), UPDATE (in both, some attr differs null-safely), with
    * `old_<attr>` / `new_<attr>` columns for every tracked attribute.
    * Unchanged keys are filtered out. Attribute comparison uses `<=>`
    * so NULL→value and value→NULL transitions count as changes.
    */
  def snapshotDiff(old: DataFrame, cur: DataFrame,
                   keys: Seq[String], attrs: Seq[String]): DataFrame = {
    val o = old.select(
      keys.map(col) ++ attrs.map(a => col(a).as(s"old_$a")) :+
        lit(true).as("__in_old"): _*)
    val n = cur.select(
      keys.map(col) ++ attrs.map(a => col(a).as(s"new_$a")) :+
        lit(true).as("__in_new"): _*)
    val changed = attrs
      .map(a => !(col(s"old_$a") <=> col(s"new_$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    // shuffle_hash, not sort-merge: a full outer can't broadcast, but
    // snapshots are ≤ 1 row per key by contract, so the per-partition
    // build side is bounded (rows/partitions, no skew possible) and
    // the hash join skips BOTH sides' per-partition sorts.
    o.hint("shuffle_hash").join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "INSERT")
          .when(col("__in_new").isNull, "DELETE")
          .when(changed, "UPDATE"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        attrs.flatMap(a => Seq(col(s"old_$a"), col(s"new_$a"))): _*)
  }
}
