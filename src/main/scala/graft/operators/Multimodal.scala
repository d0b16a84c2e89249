package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (binary-column) pipeline plumbing.
  *
  * Media assets are opaque `binary` columns with typed metadata
  * alongside; decode / feature extraction runs partition-wise in
  * bounded batches (the JVM-side equivalent of a Pandas-UDF
  * `mapInPandas` batch shape). The DECODE STEP IS A STUB — this
  * container has no image/audio codecs, so `decodeStub` parses a
  * deterministic fake header — but the Spark-side plumbing (binary
  * schema, typed Dataset, batched mapPartitions, feature schema) is
  * real and tested; swapping the stub for a JNI/codec call changes no
  * plan shape.
  */
object Multimodal {

  val BatchSize = 64

  final case class MediaRow(media_id: Long, media: Array[Byte], format: String)

  final case class MediaFeature(
      media_id: Long, format: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long, brightness: Double)

  /** STUB decoder: fake 2-byte "header" -> dimensions, CRC32 checksum,
    * mean byte value as a stand-in brightness feature. Deterministic.
    */
  def decodeStub(r: MediaRow): MediaFeature = {
    val b = r.media
    val crc = new java.util.zip.CRC32()
    crc.update(b)
    val w = if (b.length > 0) (b(0) & 0xff) + 1 else 1
    val h = if (b.length > 1) (b(1) & 0xff) + 1 else 1
    val brightness = if (b.isEmpty) 0.0 else b.map(_ & 0xff).sum.toDouble / b.length
    MediaFeature(r.media_id, r.format, b.length, w, h, crc.getValue, brightness)
  }

  /** Partition-wise batched feature extraction. The `grouped` iterator
    * bounds per-batch memory exactly like an Arrow batch in
    * mapInPandas; no partition is ever materialized whole.
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.map(decodeStub)))
  }

  /** DataFrame adapter for the query registry. */
  def featuresOf(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractFeatures(df.as[MediaRow]).toDF()
  }
}
