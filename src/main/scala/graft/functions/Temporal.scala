package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Temporal surrogate-key helpers.
  *
  * Mirrors the reference's Silver-layer key derivations
  * (reference: src/silver/transforms.py:82-111):
  *   - date_sk:      timestamp -> YYYYMMDD int
  *   - time_30m_sk:  timestamp -> half-hour slot 0..47
  *   - Excel day-fraction (0..1) -> slot / "HH:MM:00" string
  *
  * All are pure column expressions -> whole-stage-codegen friendly,
  * no UDFs, pushdown-safe.
  */
object Temporal {

  /** YYYYMMDD integer surrogate key (null-safe). */
  def dateSk(ts: Column): Column =
    date_format(ts, "yyyyMMdd").cast(IntegerType)

  /** Half-hour slot of day: hour*2 + (minute>=30). 0..47. */
  def time30mSk(ts: Column): Column =
    (hour(ts) * lit(2) + when(minute(ts) >= 30, 1).otherwise(0)).cast(IntegerType)

  /** Excel-style day fraction (0..1) -> half-hour slot 0..47. */
  def excelFractionTo30mSk(frac: Column): Column =
    floor(frac * 48).cast(IntegerType)

  /** Excel-style day fraction -> "HH:MM:00" string (minute floor). */
  def excelFractionToTime(frac: Column): Column = {
    val h = floor(frac * 24).cast(IntegerType)
    val m = floor((frac * 24 - floor(frac * 24)) * 60).cast(IntegerType)
    format_string("%02d:%02d:00", h, m)
  }

  /** ISO day of week 1=Mon..7=Sun (Spark dayofweek is 1=Sun..7=Sat). */
  def isoDow(d: Column): Column =
    ((dayofweek(d) + lit(5)) % 7 + lit(1)).cast(IntegerType)

  /** Reference day-type classification: LABORAL / SABADO / DOMINGO
    * (reference: src/silver/transforms.py:47-51 maps coded ints; here
    * derived from the calendar as load_gold.py:571 does for dim_date).
    */
  def tipoDia(d: Column): Column = {
    val dow = isoDow(d)
    when(dow === 7, "DOMINGO").when(dow === 6, "SABADO").otherwise("LABORAL")
  }

  /** Epoch-aligned tumbling window start (UTC), codegen-friendly.
    * Used by the batch/streaming 30-minute boarding aggregations
    * (reference: fct_boardings_30m grain).
    */
  def windowStart(ts: Column, seconds: Int): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds)
}
