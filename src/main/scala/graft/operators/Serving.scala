package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** AND of all active clauses; `lit(true)` when no filter is set. */
  def predicate(f: Filters,
                dateCol: String = "date_sk",
                dayCol: String = "tipo_dia",
                modeCol: String = "event_type_norm",
                slotCol: String = "time_30m_sk"): Column = {
    val hourOf = floor(col(slotCol) / 2)
    val clauses: Seq[Column] =
      f.dateSkFrom.map(v => col(dateCol) >= v).toSeq ++
      f.dateSkTo.map(v => col(dateCol) <= v).toSeq ++
      (if (f.dayTypes.nonEmpty) Seq(col(dayCol).isin(f.dayTypes.map(_.toUpperCase): _*)) else Nil) ++
      (if (f.modes.nonEmpty) Seq(col(modeCol).isin(f.modes.map(_.toUpperCase): _*)) else Nil) ++
      f.hourFrom.map(v => hourOf >= v).toSeq ++
      f.hourTo.map(v => hourOf <= v).toSeq
    clauses.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Modal (most frequent) value of `valueCol` per `keyCol`, ties
    * broken by the smallest value — the reference's representative-
    * coordinate-per-stop pattern (query_service.py:163-201).
    * Two shuffles: pair-count aggregate, then window over the (much
    * smaller) pair set.
    */
  def modalValue(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val pairs = df.groupBy(col(keyCol), col(valueCol)).agg(count(lit(1)).as("cnt"))
    Dedup.latestByGrain(
      pairs.withColumn("_neg", -col(valueCol)),
      grain = Seq(keyCol), order = Seq("cnt", "_neg"))
      .drop("_neg")
      .withColumnRenamed(valueCol, s"modal_$valueCol")
      .withColumnRenamed("cnt", "modal_cnt")
  }
}
