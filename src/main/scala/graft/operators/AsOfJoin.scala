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
  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`):
    * each fact row resolves to the dim row whose `dimDateCol` is
    * CLOSEST to the event date in either direction — backward wins
    * distance ties — optionally bounded by `toleranceDays` (a fact
    * with no dim within tolerance keeps NULL dim columns). The
    * backward-only [[apply]]/[[mergeScan]] is interval semantics;
    * nearest is snapshot semantics: "the measurement taken closest to
    * this event", the sensor/price-mark alignment rule.
    *
    * Same one-shuffle merge-scan shape as [[mergeScan]]: dim snapshots
    * and fact rows union, sort once per key by (date, dim-first), a
    * running `last` resolves the backward candidate and a
    * from-current `first` the forward one — no per-key pair
    * materialization at any fan-in. The same-date dim sorts BEFORE
    * the fact row, so it lands in the backward window at distance 0.
    * Requires `dimDateCol` unique per key (true of an SCD2 chain's
    * version starts) — duplicate same-key same-date dim rows would
    * make "the" backward candidate order-dependent.
    *
    * Output: fact columns, dim payload columns (NULL when unresolved
    * or out of tolerance), `asof_dist_days`, `asof_dir`
    * ('backward' / 'forward' / NULL).
    */
  def nearest(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
              eventDate: Column, dimDateCol: String,
              toleranceDays: Option[Int] = None): DataFrame = {
    val payload = dim.columns.filterNot(_ == dimKey).toSeq
    val factExtra = fact.columns.filterNot(_ == factKey).toSeq
    val d = TempCol("d", fact)
    val tag = TempCol("tag", fact)
    val p = TempCol("p", fact)
    val pb = TempCol("pb", fact)
    val pf = TempCol("pf", fact)
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => dim.schema(c)))
    val dimSide = dim.select(
      col(dimKey).as(factKey), col(dimDateCol).as(d), lit(0).as(tag),
      struct(payload.map(col): _*).as(p))
      .select(
        Seq(col(factKey), col(d), col(tag)) ++
          factExtra.map(c => lit(null).cast(fact.schema(c).dataType).as(c)) :+
          col(p): _*)
    val factSide = fact.select(
      Seq(col(factKey), eventDate.as(d), lit(1).as(tag)) ++
        factExtra.map(col) :+
        lit(null).cast(payloadType).as(p): _*)
    val wB = Window.partitionBy(col(factKey)).orderBy(col(d), col(tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(factKey)).orderBy(col(d), col(tag))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val resolved = factSide.unionByName(dimSide)
      .withColumn(pb, last(col(p), ignoreNulls = true).over(wB))
      .withColumn(pf, first(col(p), ignoreNulls = true).over(wF))
      .filter(col(tag) === 1)
    val distB = datediff(col(d), col(pb).getField(dimDateCol))
    val distF = datediff(col(pf).getField(dimDateCol), col(d))
    val useB = col(pb).isNotNull && (col(pf).isNull || distB <= distF)
    val cand = when(useB, col(pb)).otherwise(col(pf))
    val dist = when(useB, distB).otherwise(distF)
    val within = toleranceDays.map(t => dist <= t).getOrElse(lit(true))
    val chosen = when(cand.isNotNull && within, cand)
    resolved
      .withColumn(p, chosen)
      .select(
        Seq(col(factKey)) ++ factExtra.map(col) ++
          payload.map(c => col(s"$p.$c").as(c)) ++ Seq(
            when(col(p).isNotNull, dist).as("asof_dist_days"),
            when(col(p).isNull, lit(null).cast("string"))
              .when(useB, lit("backward")).otherwise(lit("forward")).as("asof_dir")): _*)
  }

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
