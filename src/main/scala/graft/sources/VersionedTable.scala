package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table with snapshot isolation and time travel — the
  * manifest-commit layer a lakehouse needs on storage without atomic
  * directory rename (the gap [[MedallionSink.swapDirs]]'s scaladoc
  * declares out of its own scope).
  *
  * Layout:
  * {{{
  *   <dir>/data/c<version>-<nonce>/   immutable parquet segments
  *   <dir>/_graft_log/<version>.json  manifest: mode + visible segments
  * }}}
  *
  * A commit writes its segment directory FIRST, then publishes a
  * manifest listing every segment visible at that version (append =
  * predecessor's list + the new segment; overwrite = the new segment
  * alone). The manifest rename is the commit point: a crash mid-write
  * leaves an orphan segment no manifest references — invisible to
  * every reader, reclaimed by [[vacuum]]. Readers resolve a version
  * from the log and read exactly its segment list, so a reader never
  * observes a half-commit and `asOf` reads replay any retained
  * version (time travel). Segments are never mutated after publish.
  *
  * Single WRITER (like the rest of the sink layer — concurrent
  * writers need a log-store CAS on the manifest slot, the standard
  * table-format extension); readers are unlimited and lock-free.
  * Scale: manifests hold directory names, not file lists — a segment
  * is a normal multi-file parquet directory, so commit cost is O(1)
  * driver work regardless of data size.
  */
object VersionedTable {

  /** Commit `df` as the next version. `overwrite=false` appends to the
    * predecessor's visible set; `overwrite=true` replaces it. Returns
    * the committed version number.
    *
    * `statsCol` names a numeric column whose [min, max] is recorded in
    * a `_graft_stats.json` sidecar INSIDE the new segment (written
    * before the manifest publish, so it is part of the commit):
    * [[readWhere]] then skips whole segments outside a requested key
    * range — partition-pruning for the versioned log, O(#segments)
    * driver work, no data read for skipped segments.
    *
    * `txn` is a (writer identity, sequence number) pair recorded in
    * the manifest — the idempotent-sink marker ([[lastTxnVersion]]):
    * a streaming writer keys it on (query id, batch id) so an
    * at-least-once replay commits nothing twice, while a DIFFERENT
    * query's marker is foreign and never suppresses a batch.
    */
  def commit(df: DataFrame, dir: String, overwrite: Boolean = false,
             statsCol: Option[String] = None,
             txn: Option[(String, Long)] = None): Long = {
    val spark = df.sparkSession
    val hfs = fs(spark, dir)
    val v = latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val segment = s"c$v-$nonce"
    df.write.mode("errorifexists").option("compression", "zstd")
      .parquet(s"$dir/data/$segment")
    statsCol.foreach { c =>
      // One-column scan of the segment just written (at footer-stats
      // maturity this becomes a metadata read; the sidecar contract —
      // and the pruning it feeds — is identical either way).
      import org.apache.spark.sql.functions.{col, max, min}
      val r = spark.read.parquet(s"$dir/data/$segment")
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      if (!r.isNullAt(0))
        atomicWrite(Paths.get(dir, "data", segment, s"._graft_stats.json.tmp"),
          Paths.get(dir, "data", segment, "_graft_stats.json"),
          s"""{"column": "$c", "min": ${r.getDouble(0)}, "max": ${r.getDouble(1)}}""")
    }
    val prev =
      if (overwrite) Seq.empty
      else latestVersion(spark, dir).map(pv => segments(spark, dir, pv)).getOrElse(Seq.empty)
    val segs = (prev :+ segment).map(s => s""""$s"""").mkString("[", ", ", "]")
    val mode = if (overwrite) "overwrite" else "append"
    val txnJson = txn.map { case (app, seq) =>
      s""", "txn_app": "$app", "txn_version": $seq""" }.getOrElse("")
    val json = s"""{"version": $v, "mode": "$mode", "segments": $segs$txnJson}"""
    hfs.mkdirs(new HPath(s"$dir/_graft_log"))
    atomicWrite(Paths.get(dir, "_graft_log", s".$v.json.tmp"),
      Paths.get(dir, "_graft_log", s"$v.json"), json)
    v
  }

  /** OPTIMIZE for a log of small streaming appends: rewrite the
    * CURRENT snapshot as one fresh segment and publish it as an
    * overwrite commit — readers of older versions are untouched
    * (history stays readable until [[vacuum]] reclaims it), and a
    * crash mid-rewrite leaves only an invisible orphan. Source
    * segments are immutable, so reading and rewriting concurrently
    * is safe by construction.
    */
  def optimizeCompact(spark: SparkSession, dir: String,
                      statsCol: Option[String] = None): Long =
    commit(read(spark, dir), dir, overwrite = true, statsCol = statsCol)

  /** Highest `txn` sequence number any retained manifest records for
    * writer identity `app` — the replay-detection probe for idempotent
    * streaming commits. O(#retained manifests) driver-side reads.
    */
  def lastTxnVersion(spark: SparkSession, dir: String, app: String): Option[Long] = {
    val hfs = fs(spark, dir)
    val log = new HPath(s"$dir/_graft_log")
    if (!hfs.exists(log)) None
    else {
      val seqs = hfs.listStatus(log).map(_.getPath.getName)
        .collect { case VersionFile(v) => v.toLong }
        .flatMap { v =>
          val json = manifestJson(hfs, dir, v)
          val appM = """"txn_app"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
          val seqM = """"txn_version"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
          if (appM.contains(app)) seqM else None
        }
      if (seqs.isEmpty) None else Some(seqs.max)
    }
  }

  /** Snapshot read restricted to rows with `statsCol` in [lo, hi]:
    * segments whose recorded [min, max] cannot intersect the range are
    * never opened (a segment without a stats sidecar is read —
    * conservative), and the row filter still applies to what remains.
    * With range-clustered commits (e.g. daily appends keyed by date)
    * this is the manifest-level analog of
    * [[MedallionSink.writeClustered]]'s row-group skipping.
    */
  def readWhere(spark: SparkSession, dir: String, statsCol: String,
                lo: Double, hi: Double, asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(lo <= hi, s"readWhere: lo=$lo > hi=$hi")
    val hfs = fs(spark, dir)
    val v = asOf.orElse(latestVersion(spark, dir)).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed version under $dir"))
    val kept = segments(spark, dir, v).filter { s =>
      val p = new HPath(s"$dir/data/$s/_graft_stats.json")
      if (!hfs.exists(p)) true
      else {
        val json = readText(hfs, p)
        val colM = """"column"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
        val minM = """"min"\s*:\s*(-?[\d.eE+]+)""".r.findFirstMatchIn(json).map(_.group(1).toDouble)
        val maxM = """"max"\s*:\s*(-?[\d.eE+]+)""".r.findFirstMatchIn(json).map(_.group(1).toDouble)
        if (!colM.contains(statsCol) || minM.isEmpty || maxM.isEmpty) true
        else maxM.get >= lo && minM.get <= hi
      }
    }
    if (kept.isEmpty)
      read(spark, dir, Some(v)).filter(org.apache.spark.sql.functions.lit(false))
    else spark.read.parquet(kept.map(s => s"$dir/data/$s"): _*)
      .filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }

  /** Highest committed version, if any commit has ever published. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val hfs = fs(spark, dir)
    val log = new HPath(s"$dir/_graft_log")
    if (!hfs.exists(log)) None
    else {
      val vs = hfs.listStatus(log).map(_.getPath.getName)
        .collect { case VersionFile(v) => v.toLong }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Snapshot read: the latest version, or `asOf` for time travel.
    * Throws on a version that was never committed or has been
    * vacuumed away.
    */
  def read(spark: SparkSession, dir: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(spark, dir)).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed version under $dir"))
    val segs = segments(spark, dir, v)
    spark.read.parquet(segs.map(s => s"$dir/data/$s"): _*)
  }

  /** (version, mode, n_segments) for every retained manifest,
    * oldest first — the table's commit history.
    */
  def history(spark: SparkSession, dir: String): Seq[(Long, String, Int)] = {
    val hfs = fs(spark, dir)
    val log = new HPath(s"$dir/_graft_log")
    if (!hfs.exists(log)) Seq.empty
    else hfs.listStatus(log).map(_.getPath.getName)
      .collect { case VersionFile(v) => v.toLong }.sorted.toSeq
      .map { v =>
        val json = manifestJson(hfs, dir, v)
        val mode = """"mode"\s*:\s*"(\w+)"""".r.findFirstMatchIn(json)
          .map(_.group(1)).getOrElse("?")
        (v, mode, segmentNames(json).size)
      }
  }

  /** Garbage collection: drop manifests older than the newest
    * `retainVersions`, then delete every segment directory no
    * retained manifest references — including orphans from crashed
    * commits (segment written, manifest never published). Returns
    * (manifests dropped, segments deleted).
    */
  def vacuum(spark: SparkSession, dir: String, retainVersions: Int = 1): (Int, Int) = {
    require(retainVersions >= 1, s"retainVersions=$retainVersions must be >= 1")
    val hfs = fs(spark, dir)
    val log = new HPath(s"$dir/_graft_log")
    if (!hfs.exists(log)) return (0, 0)
    val vs = hfs.listStatus(log).map(_.getPath.getName)
      .collect { case VersionFile(v) => v.toLong }.sorted.toSeq
    val (drop, keep) = vs.splitAt(math.max(vs.size - retainVersions, 0))
    val live = keep.flatMap(v => segments(spark, dir, v)).toSet
    drop.foreach(v => hfs.delete(new HPath(s"$dir/_graft_log/$v.json"), false))
    val dataDir = new HPath(s"$dir/data")
    val dead =
      if (!hfs.exists(dataDir)) Seq.empty
      else hfs.listStatus(dataDir).map(_.getPath).filterNot(p => live(p.getName)).toSeq
    dead.foreach(p => hfs.delete(p, true))
    (drop.size, dead.size)
  }

  private val VersionFile = """(\d+)\.json""".r

  private def segments(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val hfs = fs(spark, dir)
    val p = new HPath(s"$dir/_graft_log/$v.json")
    if (!hfs.exists(p))
      throw new java.util.NoSuchElementException(s"version $v not found under $dir/_graft_log")
    segmentNames(manifestJson(hfs, dir, v))
  }

  private def manifestJson(hfs: FileSystem, dir: String, v: Long): String =
    readText(hfs, new HPath(s"$dir/_graft_log/$v.json"))

  private def readText(hfs: FileSystem, p: HPath): String = {
    val in = hfs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  // Manifests are machine-written flat JSON (this object is the only
  // writer) — regex extraction, same contract as MedallionCatalog.
  private def segmentNames(json: String): Seq[String] =
    """"segments"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def atomicWrite(tmp: java.nio.file.Path, dest: java.nio.file.Path,
                          content: String): Unit = {
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dest,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
