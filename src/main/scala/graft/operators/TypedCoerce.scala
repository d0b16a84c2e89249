package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** TRY_CAST-style typed coercion of an all-VARCHAR bronze frame
  * (reference: src/silver/transforms.py:325-454 — explicit column
  * spec, TRY_CAST per column, junk becomes NULL instead of failing
  * the load).
  *
  * `try_cast` stays inside whole-stage codegen and never throws under
  * ANSI mode; columns without a target type pass through as strings.
  * Pair with [[graft.sources.CsvVarchar]] upstream and a
  * [[QualityGate]] downstream (NULL-on-junk surfaces as MISSING_*
  * reason codes) for the full bronze -> silver chain.
  */
object TypedCoerce {

  def apply(df: DataFrame, types: Seq[(String, String)]): DataFrame = {
    val typeMap = types.toMap
    df.select(df.columns.toSeq.map { c =>
      typeMap.get(c)
        .map(t => expr(s"try_cast(`$c` AS $t)").as(c))
        .getOrElse(col(c))
    }: _*)
  }
}
