package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Kimball star-schema operators beyond the base fact build: the
  * accumulating snapshot, late-arriving dimension handling, and
  * many-to-many bridge allocation (reference's model is a Kimball
  * constellation — src/gold/load_gold.py, models/gold/ddl_gold.sql —
  * these are the companion patterns its docs/queries analytics assume).
  */
object Star {

  private val money: Column => Column = c => c.cast(DecimalType(18, 2))

  /** Accumulating snapshot of a parent lifecycle from its detail rows:
    * one row per parent carrying milestone dates (first/last child
    * event) and lag spans between them, with NULL milestones for
    * parents whose lifecycle has not progressed (the LEFT join is the
    * point — incomplete lifecycles stay visible).
    *
    * Scale shape: the detail side reduces map-side to one row per
    * parent key BEFORE any join (partial-aggregable min/max/count/
    * decimal-sum), then ONE co-keyed join against the parent table —
    * the detail table is never shuffled at row grain twice.
    */
  def accumulatingSnapshot(parent: DataFrame, detail: DataFrame,
                           parentKey: String, detailKey: String,
                           detailTs: String, measure: String): DataFrame = {
    val milestones = detail.groupBy(col(detailKey))
      .agg(
        min(to_date(col(detailTs))).as("first_ship_date"),
        max(to_date(col(detailTs))).as("last_ship_date"),
        count(lit(1)).as("n_lines"),
        sum(money(col(measure))).cast("double").as("total_qty"))
    parent.join(milestones, col(parentKey) === col(detailKey), "left")
      .drop(detailKey)
  }

  /** Late-arriving dimension, phase 1: resolve the fact's FK against
    * the dim that has arrived SO FAR; misses get the Kimball unknown
    * member (SK -1) instead of being dropped or stalling the load —
    * the fact row ships now, the SK heals later. Dim side broadcast:
    * the fact is never shuffled for SK resolution.
    */
  def resolveOrUnknown(fact: DataFrame, dim: DataFrame,
                       fk: String, dimKey: String, sk: String): DataFrame =
    fact.join(broadcast(dim.select(col(dimKey))),
        col(fk) === col(dimKey), "left")
      .withColumn(sk, coalesce(col(dimKey), lit(-1L)))
      .withColumn("was_late", col(dimKey).isNull)
      .drop(dimKey)

  /** Late-arriving dimension, phase 2: once the full dim has arrived,
    * repair ONLY the unknown-member rows (SK -1) — the healed slice is
    * a filter of the fact, so the repair's cost scales with the
    * late-arrival rate, not the fact size. Rows whose key is STILL
    * missing keep the unknown member.
    */
  def repairUnknown(resolved: DataFrame, dim: DataFrame,
                    fk: String, dimKey: String, sk: String): DataFrame = {
    val healthy = resolved.filter(col(sk) =!= -1L)
    val unknown = resolved.filter(col(sk) === -1L).drop(sk)
      .join(broadcast(dim.select(col(dimKey))), col(fk) === col(dimKey), "left")
      .withColumn(sk, coalesce(col(dimKey), lit(-1L)))
      .drop(dimKey)
      .select(resolved.columns.map(col): _*)
    healthy.unionByName(unknown)
  }

  /** Many-to-many bridge allocation: spread a parent-level amount
    * across its detail rows proportional to a detail measure (the
    * Kimball bridge-table weighting pattern — e.g. order revenue
    * allocated to line items by extended price).
    *
    * Determinism doctrine: the per-parent denominator is an EXACT
    * decimal sum (order-free parallel reduction) cast to double once;
    * weight and allocated amount are then single IEEE divisions /
    * multiplications on identical inputs — bit-identical in any
    * engine. No double is ever summed in parallel.
    *
    * Scale shape: the window partitions by the parent key and the
    * parent join is co-keyed on the same key — one exchange, reused.
    */
  def bridgeAllocation(parent: DataFrame, detail: DataFrame,
                       parentKey: String, detailKey: String,
                       parentAmount: String, detailMeasure: String): DataFrame = {
    val byParent = Window.partitionBy(col(detailKey))
    val denom = sum(money(col(detailMeasure))).over(byParent).cast("double")
    detail
      .withColumn("__denom", denom)
      .withColumn("weight", col(detailMeasure) / col("__denom"))
      .join(parent.select(col(parentKey), col(parentAmount)),
        col(detailKey) === col(parentKey))
      .withColumn("allocated", col(parentAmount) * col("weight"))
      .drop(parentKey, "__denom")
  }
}
