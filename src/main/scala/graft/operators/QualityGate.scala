package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Rule-based quarantine gate.
  *
  * Re-expresses the reference's Silver quality views
  * (reference: src/silver/transforms.py:457-490, 764-796, 933-945):
  * an ordered rule list is evaluated FIRST-MATCH-WINS into a
  * `reason_code` column; rows with a reason go to quarantine, the rest
  * are the valid split, and `report` aggregates the reason
  * distribution (transforms.py:598-604).
  *
  * Everything is a single `CASE WHEN` chain -> one scan, fully
  * codegen'd, no shuffle for the splits; the report is one map-side
  * partial-aggregated groupBy.
  */
object QualityGate {
  final case class Rule(code: String, predicate: Column)

  val ReasonCol = "reason_code"

  /** Annotate rows with the first matching rule code (null = valid). */
  def withReason(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val reason = rules.foldRight(lit(null).cast(StringType)) { (r, acc) =>
      when(r.predicate, lit(r.code)).otherwise(acc)
    }
    df.withColumn(ReasonCol, reason)
  }

  def valid(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withReason(df, rules).filter(col(ReasonCol).isNull).drop(ReasonCol)

  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withReason(df, rules).filter(col(ReasonCol).isNotNull)

  /** Reason distribution incl. the valid bucket, with row counts.
    * Mirrors quality.json's `quarantine_reason_distribution` +
    * valid/invalid counts (transforms.py:606-628).
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withReason(df, rules)
      .groupBy(coalesce(col(ReasonCol), lit("VALID")).as(ReasonCol))
      .agg(count(lit(1)).as("n_rows"))

  /** Deterministic warn/fail threshold gate over the reason
    * distribution (reference: src/silver/transforms.py:214-279 —
    * sample validation with warn/fail rates; here the rates are exact
    * full-data rates, so the gate is reproducible). The total joins in
    * via a 1-row crossJoin — the report is at most rules+1 rows.
    */
  def thresholdGate(df: DataFrame, rules: Seq[Rule],
                    warnRate: Double, failRate: Double): DataFrame = {
    // the report feeds BOTH the output rows and the 1-row total — an
    // un-materialized plan would run the full upstream scan twice
    // (crossJoin branches don't share subtrees); the report is at most
    // rules+1 rows, so the eager checkpoint is metadata-sized
    val rep = report(df, rules).localCheckpoint(true)
    val total = rep.agg(sum(col("n_rows")).as("__graft_total"))
    rep.crossJoin(total)
      .withColumn("rate", col("n_rows") / col("__graft_total"))
      .withColumn("status",
        when(col(ReasonCol) === "VALID", lit("OK"))
          .when(col("rate") >= failRate, lit("FAIL"))
          .when(col("rate") >= warnRate, lit("WARN"))
          .otherwise(lit("OK")))
      .drop("__graft_total")
  }
}
