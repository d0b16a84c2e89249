package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal validity) join of facts to SCD2 dimension versions.
  *
  * The reference resolves every fact row to the dim version whose
  * [valid_from, valid_to] interval covers the event date
  * (reference: src/gold/load_gold.py:1144-1154). SCD2 intervals are
  * non-overlapping per business key, so an equi-join on the key plus
  * an interval predicate is exact (at most one match).
  *
  * Scale shape: the equi-key goes into the join condition, so Catalyst
  * plans a broadcast-hash or sort-merge join ON THE KEY with the
  * interval as a residual filter — never a cartesian/range explosion.
  * Dims are broadcast when small (the common case: stops/services ≪
  * facts).
  */
object AsOfJoin {

  /** Left-join `fact` to the covering version of `dim`.
    *
    * @param fact      fact rows
    * @param dim       SCD2 dim with valid_from/valid_to DATE columns
    * @param factKey   fact join-key column name
    * @param dimKey    dim business-key column name
    * @param eventDate fact-side event DATE column (expression allowed)
    * @param broadcastDim broadcast-hint the dim side (default true)
    */
  def apply(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
            eventDate: Column, broadcastDim: Boolean = true,
            joinType: String = "left"): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    val cond = fact(factKey) === d(dimKey) &&
      d("valid_from") <= eventDate &&
      (d("valid_to").isNull || eventDate <= d("valid_to"))
    fact.join(d, cond, joinType)
  }

  /** Large-both-sides fallback: union + merge-scan instead of a join.
    *
    * A sort-merge join on the key with the interval as residual
    * materializes |versions| × |facts| intermediate pairs per key; for
    * version-heavy keys that blows up. Here dim version-starts and
    * fact rows are unioned, sorted once per key by (date, dim-first),
    * and a running `last(_, ignoreNulls)` window resolves each fact
    * row to the most recent version at its date — ONE shuffle, zero
    * pair materialization, any fan-in.
    *
    * Requires the dim to be a contiguous SCD2 chain per key (each
    * version valid until the next starts — what [[graft.operators.Scd2]]
    * produces); with gaps in the chain, use [[apply]], which checks
    * `valid_to` explicitly.
    *
    * Output schema matches [[apply]] with `joinType = "left"`:
    * fact columns then dim payload columns (null when uncovered).
    */
  def mergeScan(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                eventDate: Column, dimOrderCol: String = "valid_from"): DataFrame = {
    val payload = dim.columns.filterNot(_ == dimKey).toSeq
    val factExtra = fact.columns.filterNot(_ == factKey).toSeq
    val d = TempCol("d", fact)
    val tag = TempCol("tag", fact)
    val p = TempCol("p", fact)
    // The dim payload travels as ONE struct so the running last()
    // moves every column atomically with its version: resolving each
    // payload column independently would backfill a legitimately-NULL
    // attribute (e.g. the current version's valid_to) from an OLDER
    // version, mixing columns across versions.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => dim.schema(c)))
    val dimSide = dim.select(
      col(dimKey).as(factKey), col(dimOrderCol).as(d), lit(0).as(tag),
      struct(payload.map(col): _*).as(p))
      .select(
        Seq(col(factKey), col(d), col(tag)) ++
          factExtra.map(c => lit(null).cast(fact.schema(c).dataType).as(c)) :+
          col(p): _*)
    val factSide = fact.select(
      Seq(col(factKey), eventDate.as(d), lit(1).as(tag)) ++
        factExtra.map(col) :+
        lit(null).cast(payloadType).as(p): _*)
    val w = Window.partitionBy(col(factKey)).orderBy(col(d), col(tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    factSide.unionByName(dimSide)
      .withColumn(p, last(col(p), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
      .select(
        Seq(col(factKey)) ++ factExtra.map(col) ++
          payload.map(c => col(s"$p.$c").as(c)): _*)
  }
}
