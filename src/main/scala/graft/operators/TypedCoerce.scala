package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Type-INFERENCE audit over an all-VARCHAR bronze frame — the
    * measurement that writes the explicit column spec [[apply]]
    * consumes (the reference hand-maintains it; this derives it from
    * evidence): per column, how many non-empty values match each
    * type's lexical form (BOOLEAN / BIGINT / DOUBLE / DATE /
    * TIMESTAMP) and the narrowest type covering ≥ `threshold` of
    * them. Shares, not all-or-nothing: one junk row shouldn't demote
    * a numeric column to VARCHAR — that's the quarantine gate's job
    * downstream.
    *
    * Classification is by ANCHORED REGEX in the Java/RE2 common
    * subset (the D18 rule) — NOT `try_cast`, whose string→number
    * edge semantics differ across engines ('1.5' to BIGINT rounds in
    * some, NULLs in others). One scan per column collapsing to a
    * 1-row panel; the ladder compare (`n ≥ threshold·n_nonnull`) is
    * a single IEEE product both engines execute identically.
    */
  def inferTypes(df: DataFrame, cols: Seq[String],
                 threshold: Double = 0.99): DataFrame = {
    require(cols.nonEmpty, "inferTypes needs at least one column")
    cols.map { c =>
      val v = trim(col(c).cast("string"))
      val nn = v.isNotNull && v =!= ""
      def share(pat: String) =
        sum(when(nn && v.rlike(pat), 1L).otherwise(0L))
      val agg = df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(nn, 1L).otherwise(0L)).as("n_nonnull"),
        share("^(true|false|TRUE|FALSE|True|False)$").as("n_bool"),
        share("^[+-]?[0-9]{1,18}$").as("n_long"),
        share("^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)([eE][+-]?[0-9]+)?$").as("n_double"),
        share("^[0-9]{4}-[0-9]{2}-[0-9]{2}$").as("n_date"),
        share("^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}").as("n_ts"))
      val thr = lit(threshold) * col("n_nonnull").cast("double")
      agg.select(lit(c).as("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_bool"), col("n_long"), col("n_double"), col("n_date"), col("n_ts"),
        when(col("n_nonnull") === 0, "VARCHAR")
          .when(col("n_bool").cast("double") >= thr, "BOOLEAN")
          .when(col("n_long").cast("double") >= thr, "BIGINT")
          .when(col("n_double").cast("double") >= thr, "DOUBLE")
          .when(col("n_date").cast("double") >= thr, "DATE")
          .when(col("n_ts").cast("double") >= thr, "TIMESTAMP")
          .otherwise("VARCHAR").as("suggested_type"))
    }.reduce(_ unionByName _)
  }

  /** Schema DRIFT between two bronze batches — the contract check a
    * lake runs when the producer ships a new drop: [[inferTypes]] on
    * both sides, full-outer on column name, one verdict per column
    * (`ADDED` / `DROPPED` / `TYPE_CHANGED` / `UNCHANGED`) plus the
    * null-rate pair (the silent killer: a column that keeps its type
    * but goes 40% NULL broke upstream just as surely). Column LISTS
    * are declared per side because drift in the column SET is exactly
    * what this audits.
    *
    * Scale shape: inferTypes' one-scan-per-column panels (each a
    * 1-row aggregate), a ≤|columns|-row outer join. The null-rate is
    * an exact-long quotient; an EMPTY batch reports rate 1.0 (all
    * missing) rather than a NULL division.
    */
  def schemaDrift(oldDf: DataFrame, newDf: DataFrame,
                  oldCols: Seq[String], newCols: Seq[String],
                  threshold: Double = 0.99): DataFrame = {
    def rate(df: DataFrame, cols: Seq[String], t: String, r: String) =
      inferTypes(df, cols, threshold).select(col("column_name"),
        col("suggested_type").as(t),
        when(col("n_rows") === 0, lit(1.0))
          .otherwise(lit(1.0) -
            col("n_nonnull").cast("double") / col("n_rows").cast("double"))
          .as(r))
    rate(oldDf, oldCols, "old_type", "old_null_rate")
      .join(rate(newDf, newCols, "new_type", "new_null_rate"),
        Seq("column_name"), "full_outer")
      .withColumn("change",
        when(col("old_type").isNull, "ADDED")
          .when(col("new_type").isNull, "DROPPED")
          .when(col("old_type") =!= col("new_type"), "TYPE_CHANGED")
          .otherwise("UNCHANGED"))
  }
}
