package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bronze-layer CSV source: every column read as VARCHAR with an
  * explicit column list (reference: src/silver/transforms.py:114-129).
  *
  * No schema inference — at 100 TB an inference pass is a full extra
  * scan, and sampled inference is silently unstable across loads. The
  * typed coercion happens downstream in the Silver cleanse (TRY_CAST
  * semantics via guarded casts), exactly as the reference splits
  * responsibilities.
  */
object CsvVarchar {

  def read(spark: SparkSession, path: String, columns: Seq[String],
           sep: String = "|", header: Boolean = false,
           nullValue: String = ""): DataFrame = {
    val schema = StructType(columns.map(StructField(_, StringType, nullable = true)))
    spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("nullValue", nullValue)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
  }
}
