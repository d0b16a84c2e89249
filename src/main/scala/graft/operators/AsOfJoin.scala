package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
