package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Medallion-layout partitioned sink + quality JSON sidecar
  * (reference: src/silver/transforms.py:136-154, 202-207).
  *
  * Data lands as ZSTD parquet under `dataset=<name>/<partition cols>`;
  * Spark's commit protocol makes the parquet write itself atomic. The
  * quality sidecar is written tmp+rename like the reference's atomic
  * JSON writes. Row count comes from a post-write metadata-only scan
  * (parquet footers), not a second full pass over the data.
  */
object MedallionSink {

  def write(df: DataFrame, root: String, dataset: String,
            partitionCols: Seq[String],
            extraStats: Map[String, Long] = Map.empty): Long = {
    val target = s"$root/dataset=$dataset"
    df.write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy(partitionCols: _*)
      .parquet(target)
    val rows = df.sparkSession.read.parquet(target).count()
    val stats = Map("dataset" -> s""""$dataset"""", "rows_written" -> rows.toString) ++
      extraStats.map { case (k, v) => k -> v.toString }
    val json = stats.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    val tmp = Paths.get(root, s".quality_$dataset.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(target, "_quality.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    rows
  }
}
