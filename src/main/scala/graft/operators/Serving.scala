package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-layer query helpers (portal/API parity).
  *
  * `Filters` + `predicate` re-express the reference's dynamic
  * predicate builder (reference: src/webapp/query_service.py:17-24,
  * 65-107): optional date-key range, day-type / mode IN-lists, and an
  * hour range derived from the half-hour slot (`time_30m_sk / 2`).
  * The predicate lands in the scan's pushed filters because it is a
  * pure column expression over the cleansed frame.
  */
object Serving {

  final case class Filters(
      dateSkFrom: Option[Int] = None,
      dateSkTo: Option[Int] = None,
      dayTypes: Seq[String] = Nil,
      modes: Seq[String] = Nil,
      hourFrom: Option[Int] = None,
      hourTo: Option[Int] = None)

  /** AND of all active clauses; `lit(true)` when no filter is set.
    * The reference filters hours as `FLOOR(time_30m_sk / 2) >= h`
    * (query_service.py:100-106); since slots are non-negative ints,
    * `floor(slot/2) >= h ⟺ slot >= 2h` and `floor(slot/2) <= h ⟺
    * slot <= 2h+1` — the range form selects identical rows but is a
    * sargable comparison on the stored column (pushable, no division).
    */
  def predicate(f: Filters,
                dateCol: String = "date_sk",
                dayCol: String = "tipo_dia",
                modeCol: String = "event_type_norm",
                slotCol: String = "time_30m_sk"): Column = {
    val clauses: Seq[Column] =
      f.dateSkFrom.map(v => col(dateCol) >= v).toSeq ++
      f.dateSkTo.map(v => col(dateCol) <= v).toSeq ++
      (if (f.dayTypes.nonEmpty) Seq(col(dayCol).isin(f.dayTypes.map(_.toUpperCase): _*)) else Nil) ++
      (if (f.modes.nonEmpty) Seq(col(modeCol).isin(f.modes.map(_.toUpperCase): _*)) else Nil) ++
      f.hourFrom.map(v => col(slotCol) >= 2 * v).toSeq ++
      f.hourTo.map(v => col(slotCol) <= 2 * v + 1).toSeq
    clauses.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Modal (most frequent) value combination per `keyCol`, ties broken
    * by the value columns ASCENDING — the reference's representative-
    * coordinate-per-stop pattern: `ROW_NUMBER() OVER (PARTITION BY
    * stop_code ORDER BY COUNT(*) DESC, x_utm, y_utm)` (reference:
    * src/webapp/query_service.py:163-201). Works for any column type
    * (no numeric negation trick). Two shuffles: pair-count aggregate
    * (map-side combined), then a window over the much smaller
    * (key, values) set.
    */
  def modalValue(df: DataFrame, keyCol: String, valueCols: Seq[String]): DataFrame = {
    val pairs = df.groupBy((keyCol +: valueCols).map(col): _*)
      .agg(count(lit(1)).as("modal_cnt"))
    val rn = TempCol("rn", pairs)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("modal_cnt").desc +: valueCols.map(col(_).asc): _*)
    pairs.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Spatial grid density: points binned into square `cell`-sized
    * cells by integer floor-division of their coordinates, per-cell
    * point counts and an exact-decimal weight sum — the heat-map /
    * coverage-density serving aggregation over stop coordinates.
    * Cell ids are pure integer functions of the coordinates (floor of
    * one IEEE division), so the binning replays in any engine; the
    * weight sums as DECIMAL(18,2) partials (order-free) and rounds
    * once, the `roundedSum` money convention.
    *
    * Scale shape: one partial-agg shuffle on the (tiny) cell-id key
    * space; no window, no join.
    */
  def gridDensity(pts: DataFrame, xCol: String, yCol: String, cell: Double,
                  weightCol: String): DataFrame = {
    require(cell > 0, s"cell=$cell must be positive")
    pts.groupBy(
        floor(col(xCol) / cell).cast("long").as("cell_x"),
        floor(col(yCol) / cell).cast("long").as("cell_y"))
      .agg(count(lit(1)).as("n_points"),
        coalesce(round(sum(col(weightCol)
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))), 2), lit(0))
          .cast("double").as("weight_sum"))
      .withColumn("cell_x_min", col("cell_x") * cell)
      .withColumn("cell_y_min", col("cell_y") * cell)
  }
}
