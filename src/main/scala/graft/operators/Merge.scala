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
}
