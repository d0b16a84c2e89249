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

  /** Grid-density hotspot clustering (DBSCAN's grid cousin): dense
    * cells (`n_points >= minPts`) merge with their 8-neighbors into
    * connected hotspot regions — the "where do boardings concentrate"
    * serving panel over the [[gridDensity]] heat map.
    *
    * Cells pack into a single long id `(cell_x + off)·2off + cell_y
    * + off` (pure integer arithmetic, engine-replayable; the `off`
    * bound covers any earthly coordinate / cell size combination and
    * is guarded). Adjacency is an 8-offset explode joined back to the
    * dense-cell id set — candidate volume is 8·|dense cells|, never
    * cells² — and regions come from the repo's min-label fixpoint
    * ([[graft.operators.TextDedup.connectedComponents]]: O(diameter)
    * rounds, scalar-only driver traffic). Isolated dense cells are
    * their own single-cell region. Everything downstream of the
    * density aggregation operates on the dense-cell PANEL (bounded by
    * area / cell², not by data volume) — the 100 TB shape.
    *
    * Output: one row per hotspot — cluster_id (min packed cell id),
    * n_cells, n_points, weight_sum, and the cell-coordinate bounding
    * box.
    */
  def hotspotClusters(pts: DataFrame, xCol: String, yCol: String,
                      cell: Double, weightCol: String,
                      minPts: Long): DataFrame = {
    require(minPts >= 1, s"minPts=$minPts must be >= 1")
    val off = 1000000L
    def pack(cx: Column, cy: Column): Column =
      (cx + off) * (2 * off) + (cy + off)
    val dense = gridDensity(pts, xCol, yCol, cell, weightCol)
      .filter(col("n_points") >= minPts)
      .withColumn("__id", pack(col("cell_x"), col("cell_y")))
      .localCheckpoint(false)
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val nbr = dense.select(col("__id"), col("cell_x"), col("cell_y"),
        explode(array(offsets: _*)).as("o"))
      .select(col("__id"),
        pack(col("cell_x") + col("o.dx"), col("cell_y") + col("o.dy"))
          .as("__nbr"))
    val edges = nbr
      .join(dense.select(col("__id").as("__nbr")), Seq("__nbr"))
      .filter(col("__id") < col("__nbr"))
    val labels = TextDedup.connectedComponents(edges, "__id", "__nbr")
      .withColumnRenamed("doc_id", "__id")
    // labels ≤ one row per dense cell: shuffled-hash beats sorting the
    // checkpointed (stats-free) label relation (snapshot-diff
    // convention)
    dense.join(labels.hint("shuffle_hash"), Seq("__id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("__id")))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n_points")).as("n_points"),
        sum(col("weight_sum")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("weight_sum"),
        min(col("cell_x")).as("cell_x_min"),
        max(col("cell_x")).as("cell_x_max"),
        min(col("cell_y")).as("cell_y_min"),
        max(col("cell_y")).as("cell_y_max"))
  }
}
