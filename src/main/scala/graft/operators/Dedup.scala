package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * `latestByGrain` re-expresses the reference's fact-merge dedup
  * (reference: src/gold/load_gold.py:1076-1083, 1235-1243:
  * ROW_NUMBER() OVER (PARTITION BY grain ORDER BY ts DESC) = 1).
  *
  * `exactByKey` is the exact-duplicate collapse used by the
  * training-data pipeline (group on content, keep smallest id).
  * Both are one shuffle on the grain; partial aggregation applies.
  */
object Dedup {

  /** Keep the latest row per grain; `order` columns are ranked DESC
    * (first = primary recency, rest = deterministic tie-breaks).
    */
  def latestByGrain(df: DataFrame, grain: Seq[String], order: Seq[String]): DataFrame = {
    val rn = TempCol("rn", df)
    val w = Window.partitionBy(grain.map(col): _*).orderBy(order.map(col(_).desc): _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Keep the FIRST row per grain (order columns ranked ASC) — the
    * deterministic batch reference for streaming first-delivery-wins
    * dedup ([[graft.streaming.StreamOps.dedupStream]]). The stream
    * keeps the first row its state store ENCOUNTERS, which equals
    * this operator when each key's deliveries reach the state in
    * event-time order (single ordered source partition per key — the
    * spec's setup); across a multi-partition micro-batch, shuffle
    * fetch order makes the stream's survivor arbitrary, while this
    * batch form is always the event-time minimum.
    */
  def firstByGrain(df: DataFrame, grain: Seq[String], order: Seq[String]): DataFrame = {
    val rn = TempCol("rn", df)
    val w = Window.partitionBy(grain.map(col): _*).orderBy(order.map(col(_).asc): _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Exact dedup on a content column: one surviving id per distinct
    * content value plus the duplicate count.
    */
  def exactByKey(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop(contentCol)

  /** Skew-hardened [[latestByGrain]]: hot grains (one key holding a
    * large share of the data) overload the single task a plain window
    * sends them to — AQE skew handling covers joins, not windows. Here
    * a first rank runs within (grain, salt-of-order-columns) so a hot
    * grain spreads over `salt` tasks, each keeping one candidate; the
    * second rank sees at most `salt` rows per grain. Identical output
    * to [[latestByGrain]] for any input.
    */
  def latestByGrainSalted(df: DataFrame, grain: Seq[String], order: Seq[String],
                          salt: Int = 64): DataFrame = {
    val rn = TempCol("rn", df)
    val saltCol = pmod(xxhash64(order.map(col): _*), lit(salt))
    val local = Window.partitionBy(grain.map(col) :+ saltCol: _*)
      .orderBy(order.map(col(_).desc): _*)
    val global = Window.partitionBy(grain.map(col): _*)
      .orderBy(order.map(col(_).desc): _*)
    df.withColumn(rn, row_number().over(local))
      .filter(col(rn) === 1)
      .withColumn(rn, row_number().over(global))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
