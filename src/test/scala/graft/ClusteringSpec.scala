package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.sources.MedallionSink

/** Range-clustered layout: the written files' parquet footers must
  * carry disjoint per-file key ranges — the property that lets a
  * pushed predicate skip whole row groups at scan time.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("writeClustered produces disjoint per-file key ranges and a pushed scan filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val path = s"$dir/ev"
    // write keys shuffled so clustering, not arrival order, must do the work
    val df = new scala.util.Random(7).shuffle((0L until 10000L).toList)
      .map(k => (k, s"payload_$k")).toDF("k", "payload")
    MedallionSink.writeClustered(df, path, "k", nFiles = 8)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 8, s"expected 8 clustered files, got ${files.length}")

    // per-file [min, max] of k from the footers, for every row group
    val ranges = files.toSeq.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        assert(blocks.nonEmpty)
        val stats = blocks.map(_.getColumns.asScala
          .find(_.getPath.toDotString == "k").get.getStatistics)
        val mins = stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue)
        val maxs = stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        // row groups inside a file are sorted too (sortWithinPartitions)
        assert(mins.zip(maxs).forall { case (mn, mx) => mn <= mx })
        (mins.min, maxs.max)
      } finally reader.close()
    }.sortBy(_._1)
    // files tile the key space with no overlap: range partitioning
    // sends each key to exactly one file
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1,
        s"file ranges overlap: $a vs $b — row-group skipping would degrade")
      case _ =>
    }
    assert(ranges.head._1 == 0L && ranges.last._2 == 9999L)

    // the point predicate reaches the scan as a pushed filter, so the
    // reader can apply those footer ranges
    val plan = spark.read.parquet(path).filter(col("k") === 4242L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(k,4242)"), plan)
    assert(spark.read.parquet(path).filter(col("k") === 4242L).count() == 1L)
  }

  test("writeZOrdered: footer ranges prune BOTH dimensions (tiles, not stripes)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val path = s"$dir/grid"
    // full 64x64 grid, shuffled: 16 files of 256 rows = one 16x16
    // aligned Z-tile each when bits=6
    val grid = new scala.util.Random(11).shuffle(
      (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)).toList)
      .toDF("x", "y")
    MedallionSink.writeZOrdered(grid, path, "x", "y", nFiles = 16, bits = 6)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 16)
    def fileRange(f: Path, dim: String): (Long, Long) = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val stats = reader.getFooter.getBlocks.asScala.toSeq.map(_.getColumns.asScala
          .find(_.getPath.toDotString == dim).get.getStatistics)
        (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
          stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
      } finally reader.close()
    }
    // a filter on x <= 7 OR on y <= 7 each matches only a quarter of
    // the files' footer ranges — range-clustering on x alone would
    // leave ALL files matching the y filter
    val xMatch = files.count(f => fileRange(f, "x")._1 <= 7)
    val yMatch = files.count(f => fileRange(f, "y")._1 <= 7)
    assert(xMatch <= 8 && yMatch <= 8, s"x-files=$xMatch y-files=$yMatch of 16")
    // nothing lost: the full grid reads back
    assert(spark.read.parquet(path).count() == 4096)
    assert(spark.read.parquet(path).filter(col("x") <= 7 && col("y") <= 7).count() == 64)
  }

  test("writeZOrderedN: 3-D tiles footer-prune on EVERY dimension") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3").toString
    val path = s"$dir/cube"
    // full 16x16x16 cube, shuffled: 64 files of ~64 rows; with bits=4
    // an exactly-aligned file covers a 4x4x4 tile — range boundaries
    // come from SAMPLING, so real files bleed across tile edges; the
    // assertion allows 2x the aligned-ideal match count (the same
    // slop the 2-D test carries)
    val cube = new scala.util.Random(13).shuffle(
      (for { x <- 0 until 16; y <- 0 until 16; z <- 0 until 16 }
        yield (x.toLong, y.toLong, z.toLong)).toList)
      .toDF("x", "y", "z")
    MedallionSink.writeZOrderedN(cube, path, Seq("x", "y", "z"), nFiles = 64, bits = 4)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 64)
    def fileMin(f: Path, dim: String): Long = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try reader.getFooter.getBlocks.asScala.toSeq.map(_.getColumns.asScala
        .find(_.getPath.toDotString == dim).get.getStatistics
        .genericGetMin.asInstanceOf[java.lang.Long].longValue).min
      finally reader.close()
    }
    // a quarter-stripe filter (v <= 3) on ANY single dimension matches
    // ~1/4 of aligned tiles (16 of 64; allow 32 for boundary bleed) —
    // linear clustering on x would leave ALL 64 matching for y and z
    for (dim <- Seq("x", "y", "z")) {
      val n = files.count(f => fileMin(f, dim) <= 3)
      assert(n <= 32, s"$dim-filter matches $n of 64 files — no 3-D locality")
    }
    assert(spark.read.parquet(path).count() == 4096)
    assert(spark.read.parquet(path)
      .filter(col("x") <= 3 && col("y") <= 3 && col("z") <= 3).count() == 64)
  }

  test("optimizeZOrder: appends destroy file pruning, the rewrite restores it, history survives") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft_vt_zorder").toString
    // four appends, each a shuffled slice SPANNING the full 64x64 grid
    // (interleaved x stripes), committed through the versioned log
    // with a txn marker that must survive the rewrite
    val all = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    (0 until 4).foreach { s =>
      val slice = new scala.util.Random(17 + s)
        .shuffle(all.filter(_._1 % 4 == s).toList).toDF("x", "y")
      VersionedTable.commit(slice, dir, txn = Some(("zq", s.toLong)))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    def dataFiles(): Seq[Path] = {
      val segs = VersionedTable.read(spark, dir).inputFiles.toSeq
      segs.map(new Path(_))
    }
    def fileMin(f: Path, dim: String): Long = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try reader.getFooter.getBlocks.asScala.toSeq.map(_.getColumns.asScala
        .find(_.getPath.toDotString == dim).get.getStatistics
        .genericGetMin.asInstanceOf[java.lang.Long].longValue).min
      finally reader.close()
    }
    // before the rewrite: every append spans the whole y space, so a
    // selective y filter prunes NOTHING at file level
    val before = dataFiles()
    assert(before.count(f => fileMin(f, "y") <= 7) == before.size,
      "append segments unexpectedly clustered — the rewrite would prove nothing")

    val v = VersionedTable.optimizeZOrder(spark, dir, Seq("x", "y"),
      nFiles = 16, bits = 6)
    val after = dataFiles()
    assert(after.size == 16)
    // tiles, not stripes: a quarter-stripe filter on EITHER dimension
    // matches ~1/4 of the 16 files (allow 2x for range-sample bleed)
    val xMatch = after.count(f => fileMin(f, "x") <= 7)
    val yMatch = after.count(f => fileMin(f, "y") <= 7)
    assert(xMatch <= 8 && yMatch <= 8, s"x-files=$xMatch y-files=$yMatch of 16")
    // nothing lost, nothing doubled
    assert(VersionedTable.read(spark, dir, Some(v)).count() == 4096)
    assert(VersionedTable.read(spark, dir, Some(v))
      .filter(col("x") <= 7 && col("y") <= 7).count() == 64)
    // history: the pre-rewrite head still reads until vacuum; the txn
    // marker survived the rewrite (replays still detected)
    assert(VersionedTable.read(spark, dir, Some(v - 1)).count() == 4096)
    assert(VersionedTable.lastTxnVersion(spark, dir, "zq").contains(3L))
    VersionedTable.vacuum(spark, dir, retainVersions = 1, orphanGraceMs = 0L)
    intercept[java.util.NoSuchElementException] {
      VersionedTable.read(spark, dir, asOf = Some(v - 1))
    }
    assert(VersionedTable.read(spark, dir).count() == 4096)
  }
}
