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
    atomicWrite(Paths.get(root, s".quality_$dataset.json.tmp"),
      Paths.get(target, "_quality.json"), json)
    writeMetaSidecars(df, target, partitionCols)
    rows
  }

  /** Physical cut replacement: dynamic partition overwrite — ONLY the
    * partition directories present in `df` are rewritten; every other
    * partition's files are untouched (the reference's
    * delete-cut-then-reload, models/gold/cleanup_cut.sql, without a
    * full-dataset rewrite). Sidecars refresh from the written files'
    * footer counts (untouched partitions rewrite byte-identical
    * sidecars). Logical twin: graft.operators.Merge.replaceCut.
    */
  def overwritePartitions(df: DataFrame, root: String, dataset: String,
                          partitionCols: Seq[String]): Unit = {
    val target = s"$root/dataset=$dataset"
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy(partitionCols: _*)
      .parquet(target)
    writeMetaSidecars(df, target, partitionCols)
  }

  /** Bucketed table write: rows are co-located by hash(bucketCols) at
    * WRITE time, so every later join or aggregation on the bucket key
    * plans with ZERO exchanges — the 100-TB shape for recurring
    * fact-fact joins (grain merges, as-of staging) where re-shuffling
    * the fact on every run is the dominant cost. The same columns are
    * `sortBy`-ed so sort-merge joins skip their per-task sorts too.
    * Goes through `saveAsTable` because bucket metadata must live in a
    * catalog for the reader to trust it (a bare parquet path carries
    * no bucketing contract). BucketingSpec pins the exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .format("parquet").option("compression", "zstd")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Per-partition `_meta.json` sidecars (authoritative row_count +
    * column list — the reference's bronze sidecar contract, served to
    * graft.sources.MedallionCatalog's read-side validation). Counts
    * come from ONE aggregate over the parquet JUST WRITTEN (footer
    * metadata — never a recompute of the input pipeline, which would
    * double the load's cost and could even disagree with the files if
    * the source moved); only #partitions rows reach the driver.
    * Directory names go through Spark's own partition-path escaping,
    * so special characters and NULL values land next to the data
    * files Spark wrote, not in a parallel unescaped tree.
    */
  private def writeMetaSidecars(df: DataFrame, target: String,
                                partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.functions.{col, count, lit}
    val dataCols = df.columns.filterNot(partitionCols.contains).toSeq
    val colsJson = dataCols.map(c => s""""$c"""").mkString("[", ", ", "]")
    val counts = df.sparkSession.read.parquet(target)
      .groupBy(partitionCols.map(c => col(c).cast("string")): _*)
      .agg(count(lit(1)).as("__n")).collect()
    counts.foreach { r =>
      val dir = partitionCols.zipWithIndex.map { case (c, i) =>
        val v = r.getString(i)
        if (v == null) s"$c=${ExternalCatalogUtils.DEFAULT_PARTITION_NAME}"
        else s"$c=${ExternalCatalogUtils.escapePathName(v)}"
      }.mkString("/")
      val n = r.getLong(partitionCols.length)
      val json = s"""{"row_count": $n, "columns": $colsJson}"""
      atomicWrite(Paths.get(target, dir, s"._meta.json.tmp"),
        Paths.get(target, dir, "_meta.json"), json)
    }
  }

  private def atomicWrite(tmp: java.nio.file.Path, dest: java.nio.file.Path,
                          content: String): Unit = {
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dest,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
