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

  private val money: Column => Column = c =>
    graft.expressions.Kernels.toDecimal(c.cast("double"), 18, 2)

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

  /** Periodic-snapshot fact (the third Kimball fact type, next to the
    * transactional star and the accumulating snapshot): one row per
    * (key, period) from the key's FIRST active month through the
    * global latest month — inactive months materialize with zero
    * activity and the running balance carried forward, which is the
    * entire point of a periodic snapshot (a balance query must not
    * skip quiet months).
    *
    * Determinism doctrine: period amounts are exact decimal sums; the
    * running balance is a decimal prefix sum over the period window
    * (order-free partial aggregation inside each month, exact window
    * accumulation across ≤ #months rows per key) cast to double once.
    *
    * Scale shape: the fact collapses to (key, month) grain in one
    * partial-aggregable shuffle BEFORE the grid expands (grid rows =
    * Σ per-key active spans — bounded by keys × months, never fact-
    * sized); the global max month is a broadcast 1-row aggregate; the
    * balance window partitions by key over month-count rows.
    */
  def periodicSnapshot(fact: DataFrame, key: String, ts: String,
                       amount: String): DataFrame = {
    val monthly = fact.groupBy(col(key), trunc(to_date(col(ts)), "month").as("month"))
      .agg(count(lit(1)).as("n_orders"), sum(money(col(amount))).as("__spend"))
    val maxMonth = monthly.agg(max(col("month")).as("__max_month"))
    val spans = monthly.groupBy(col(key)).agg(min(col("month")).as("__first"))
      .crossJoin(broadcast(maxMonth))
    val grid = spans.select(col(key),
      explode(sequence(col("__first"), col("__max_month"),
        expr("interval 1 month"))).as("month"))
    val w = Window.partitionBy(col(key)).orderBy(col("month"))
    // shuffle_hash, not sort-merge: both sides are ≤ 1 row per
    // (key, month) by construction, so the per-partition build side
    // is bounded and skew-free — the hash join skips both sorts.
    grid.join(monthly.hint("shuffle_hash"), Seq(key, "month"), "left")
      .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
      .withColumn("__spend",
        coalesce(col("__spend"), lit(0).cast(DecimalType(18, 2))))
      .withColumn("month_spend", col("__spend").cast("double"))
      .withColumn("cum_spend", sum(col("__spend")).over(w).cast("double"))
      .drop("__spend")
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

  /** Data-Vault LINK build — the raw-vault modeling move next to the
    * star schema's conformed dims: one row per distinct relationship
    * between two business keys, identified by deterministic md5 hash
    * keys (hub hashes from each rendered business key, the link hash
    * from their '|'-joined pair — the standard hash-key discipline
    * that makes vault loads idempotent, parallel and join-cheap at
    * any scale: fixed-width keys, no sequence generator, no lookup).
    * Load metadata rides along: first-seen timestamp and relationship
    * row count (the satellite seed).
    *
    * Scale shape: ONE partial-agg shuffle on the business-key pair
    * (count + min collapse map-side); the hashes are codegen'd
    * expressions over the group keys — no second pass, no join. Hub
    * tables project from the same output (`SELECT DISTINCT hub_*`).
    */
  def dataVaultLink(rel: DataFrame, leftKey: String, rightKey: String,
                    loadTsCol: String): DataFrame = {
    def hashOf(cols: Seq[Column]): Column =
      md5(concat_ws("|", cols.map(c =>
        coalesce(c.cast("string"), lit("<NULL>"))): _*))
    rel.filter(col(leftKey).isNotNull && col(rightKey).isNotNull)
      .groupBy(col(leftKey).as("left_key"), col(rightKey).as("right_key"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(loadTsCol)).as("first_seen"))
      .select(
        hashOf(Seq(col("left_key"), col("right_key"))).as("link_hash"),
        hashOf(Seq(col("left_key"))).as("hub_left_hash"),
        hashOf(Seq(col("right_key"))).as("hub_right_hash"),
        col("left_key"), col("right_key"), col("first_seen"), col("n_rows"))
  }
}
