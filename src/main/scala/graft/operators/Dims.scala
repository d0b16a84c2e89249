package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import graft.functions.Temporal

/** Dimension builders for the Kimball layer.
  *
  * dim_date / dim_time_30m mirror the reference's generated dims
  * (reference: src/gold/load_gold.py:525-595 and 486-502); lookupDim
  * mirrors upsert_lookup_dim (src/gold/sql_helpers.py) with
  * deterministic surrogate keys (dense rank over sorted business
  * values) instead of identity columns — reproducible on any cluster,
  * no sequential bottleneck.
  */
object Dims {

  /** Calendar dimension covering [min(dateCol), max(dateCol)] of `df`.
    * Full-day coverage via sequence+explode — distributed, no driver loop.
    */
  def dimDate(df: DataFrame, dateCol: Column): DataFrame = {
    val bounds = df.agg(min(to_date(dateCol)).as("d0"), max(to_date(dateCol)).as("d1"))
    val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("full_date"))
    days.select(
      (year(col("full_date")) * 10000 + month(col("full_date")) * 100 +
        dayofmonth(col("full_date"))).cast("int").as("date_sk"),
      col("full_date"),
      year(col("full_date")).as("year"),
      month(col("full_date")).as("month"),
      dayofmonth(col("full_date")).as("day"),
      weekofyear(col("full_date")).as("iso_week"),
      Temporal.isoDow(col("full_date")).as("iso_dow"),
      (Temporal.isoDow(col("full_date")) >= 6).as("is_weekend"),
      date_format(col("full_date"), "yyyy-MM").as("year_month"),
      Temporal.tipoDia(col("full_date")).as("tipo_dia"))
  }

  /** 48-slot half-hour time dimension (dim_time_30m). */
  def dimTime30m(spark: SparkSession): DataFrame = {
    val i = col("id").cast("int")
    val h = floor(i / 2).cast("int")
    val m = ((i % 2) * 30).cast("int")
    val endH = (floor((i + 1) / 2) % 24).cast("int")
    val endM = (((i + 1) % 2) * 30).cast("int")
    spark.range(48).select(
      i.as("time_30m_sk"),
      format_string("%02d:%02d:00", h, m).as("start_time"),
      format_string("%02d:%02d:00", endH, endM).as("end_time"),
      h.as("hour"),
      m.as("minute"),
      format_string("%02d:%02d", h, m).as("label"))
  }

  /** Lookup dim from the distinct values of a column, with
    * deterministic dense surrogate keys (1..n over sorted values).
    *
    * Scale shape: distinct is a map-side-combined aggregate, the sort
    * is a distributed range sort, and the dense numbering comes from
    * `zipWithIndex` (one count job over the sorted partitions, then
    * offset arithmetic per partition) — NO single-partition global
    * window, so a high-cardinality column (stop_code at 100 TB) never
    * funnels through one task. Output is identical to a
    * `ROW_NUMBER() OVER (ORDER BY name)` for any input.
    *
    * EAGER: `zipWithIndex` runs the distinct+sort ONCE at construction
    * (its internal count job). The sorted set is localCheckpoint-ed
    * first, so that one job materializes it and every downstream
    * action reuses the blocks — without it the un-cached RDD lineage
    * would re-run the distinct+sort per action, and a re-sampled range
    * sort could even renumber between branches. The result is an RDD
    * scan (no pushdown through the dim) — fine for lookup dims, which
    * are small by construction; join them with `broadcast()`.
    */
  def lookupDim(df: DataFrame, valueCol: String, skName: String, nameCol: String): DataFrame = {
    val spark = df.sparkSession
    val distinctVals = df.select(trim(col(valueCol)).as(nameCol))
      .filter(col(nameCol).isNotNull && col(nameCol) =!= "")
      .distinct()
      .sort(col(nameCol))
      .localCheckpoint(false)
    val numbered = distinctVals.rdd.zipWithIndex().map { case (r, i) =>
      Row((i + 1).toInt, r.getString(0))
    }
    spark.createDataFrame(numbered, StructType(Seq(
      StructField(skName, IntegerType, nullable = false),
      StructField(nameCol, StringType, nullable = true))))
  }

  /** Junk dimension (Kimball): the distinct COMBINATIONS of a set of
    * low-cardinality flag/indicator columns collapsed into one dim
    * with a dense surrogate key, so the fact carries a single junk SK
    * instead of n flag columns. Same scale machinery as [[lookupDim]]
    * — sorted `zipWithIndex` dense numbering (no single-partition
    * window), localCheckpoint so the numbering is materialized once —
    * generalized to a multi-column grain; output is identical to
    * `ROW_NUMBER() OVER (ORDER BY cols)`. The combo space is tiny by
    * definition (it is a product of flag domains): resolve facts with
    * a `broadcast()` join on the flag columns.
    */
  def junkDim(df: DataFrame, flagCols: Seq[String], skName: String): DataFrame = {
    require(flagCols.nonEmpty, "junkDim needs at least one flag column")
    val spark = df.sparkSession
    // asc_nulls_last, NOT Spark's NULLS FIRST default: ROW_NUMBER()
    // OVER (ORDER BY …) in ANSI engines (DuckDB, Postgres) defaults
    // ascending NULLS LAST, and the scaladoc promises ROW_NUMBER-
    // identical numbering even when a flag column carries NULLs
    val combos = df.select(flagCols.map(col): _*)
      .distinct()
      .sort(flagCols.map(c => asc_nulls_last(c)): _*)
      .localCheckpoint(false)
    val numbered = combos.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1).toInt +: r.toSeq)
    }
    spark.createDataFrame(numbered, StructType(
      StructField(skName, IntegerType, nullable = false) +: combos.schema.fields.toSeq))
  }
}
