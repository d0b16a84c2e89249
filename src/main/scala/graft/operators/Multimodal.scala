package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (binary-column) pipeline.
  *
  * Media assets are opaque `binary` columns with typed metadata
  * alongside; decode / feature extraction runs partition-wise in
  * bounded batches (the JVM-side equivalent of a Pandas-UDF
  * `mapInPandas` batch shape).
  *
  * The decode step is REAL for the formats the JDK ships codecs for:
  * `javax.imageio` (PNG, BMP, GIF, JPEG, WBMP — true pixel dimensions
  * and a mean-RGB brightness over a bounded pixel sample) and
  * `javax.sound.sampled` (WAV/AIFF/AU — sample rate, frame-exact
  * duration and a bounded mean-|amplitude| for 16-bit PCM). Formats
  * without a JDK codec (video/custom) fall back to [[decodeStub]], a
  * deterministic header parse that keeps the schema and plan shape
  * identical — swapping in a JNI/codec call changes nothing upstream.
  */
object Multimodal {

  val BatchSize = 64

  /** Formats `javax.imageio` decodes out of the box. */
  val JdkImageFormats: Set[String] = Set("png", "bmp", "gif", "jpg", "jpeg", "wbmp")

  /** Container formats `javax.sound.sampled` parses out of the box. */
  val JdkAudioFormats: Set[String] = Set("wav", "wave", "aiff", "aifc", "au")

  /** Video containers the in-JVM demux + JDK image codecs can decode
    * for real: RIFF/AVI carrying Motion-JPEG frames (each frame is a
    * baseline JPEG — javax.imageio territory). Codec-compressed
    * streams (H.264 …) still take the stub: no JDK decoder exists.
    */
  val JdkVideoFormats: Set[String] = Set("avi")

  final case class MediaRow(media_id: Long, media: Array[Byte], format: String)

  /** Feature row across modalities: images fill width/height/
    * brightness, audio fills sample_rate/duration_ms and reuses
    * `brightness` as mean |amplitude| in [0,1]; the unused modality's
    * slots are zero. One schema for the whole media table keeps the
    * downstream pipeline (joins, gates, stats) modality-agnostic.
    */
  final case class MediaFeature(
      media_id: Long, format: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long, brightness: Double,
      sample_rate: Int, duration_ms: Long)

  /** Real-or-stub dispatch: JDK-codec formats decode true content;
    * anything else (or a corrupt body) takes the deterministic stub.
    */
  def decode(r: MediaRow): MediaFeature = {
    val fmt = Option(r.format).map(_.toLowerCase).getOrElse("")
    if (JdkImageFormats.contains(fmt)) decodeImage(r).getOrElse(decodeStub(r))
    else if (JdkAudioFormats.contains(fmt)) decodeAudio(r).getOrElse(decodeStub(r))
    else if (JdkVideoFormats.contains(fmt)) decodeVideo(r).getOrElse(decodeStub(r))
    else decodeStub(r)
  }

  /** javax.imageio decode: true width/height; brightness = mean of
    * (R+G+B)/3 over a pixel grid sample capped at ~2¹⁶ pixels, so a
    * 100-megapixel asset costs the same as a thumbnail (the bound that
    * matters when a partition holds thousands of assets).
    */
  private[operators] def decodeImage(r: MediaRow): Option[MediaFeature] = {
    // JDK ImageIO plugins throw RuntimeExceptions (AIOOBE, CMMException,
    // NegativeArraySizeException...) on malformed bodies, not just
    // IOException — any decode failure must take the stub, never kill
    // the task.
    val img =
      try ImageIO.read(new ByteArrayInputStream(r.media))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val stride = math.max(1, math.ceil(math.sqrt(w.toDouble * h / 65536.0)).toInt)
      var sum = 0L
      var n = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          n += 3
          x += stride
        }
        y += stride
      }
      val crc = new java.util.zip.CRC32()
      crc.update(r.media)
      MediaFeature(r.media_id, r.format, r.media.length, w, h, crc.getValue,
        if (n == 0) 0.0 else sum.toDouble / n, 0, 0L)
    }
  }

  /** javax.sound.sampled decode: header-true sample rate + frame-exact
    * duration; mean |amplitude| (normalized to [0,1]) over a bounded
    * PCM sample capped at 128 KiB, so an hour-long asset costs the
    * same as a jingle. Non-16-bit or compressed encodings keep the
    * header facts and report amplitude 0.
    */
  private[operators] def decodeAudio(r: MediaRow): Option[MediaFeature] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        val durMs =
          if (f.getFrameRate > 0 && frames >= 0)
            math.round(frames * 1000.0 / f.getFrameRate)
          else 0L
        val crc = new java.util.zip.CRC32()
        crc.update(r.media)
        Some(MediaFeature(r.media_id, r.format, r.media.length, 0, 0,
          crc.getValue, meanAmplitude(in, f), f.getSampleRate.toInt, durMs))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def meanAmplitude(in: AudioInputStream, f: AudioFormat): Double = {
    if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
        f.getSampleSizeInBits != 16) return 0.0
    val cap = 131072
    val buf = new Array[Byte](cap)
    var filled = 0
    var k = in.read(buf, 0, cap)
    while (k > 0 && filled + k < cap) { filled += k; k = in.read(buf, filled, cap - filled) }
    if (k > 0) filled += k
    var sum = 0L
    var i = 0
    while (i + 1 < filled) {
      val s =
        if (f.isBigEndian) (buf(i) << 8) | (buf(i + 1) & 0xff)
        else (buf(i + 1) << 8) | (buf(i) & 0xff)
      sum += math.abs(s)
      i += 2
    }
    val n = filled / 2
    if (n == 0) 0.0 else sum.toDouble / n / 32768.0
  }

  /** STUB decoder for non-JDK formats: fake 2-byte "header" ->
    * dimensions, CRC32 checksum, mean byte value as a stand-in
    * brightness feature. Deterministic.
    */
  def decodeStub(r: MediaRow): MediaFeature = {
    val b = r.media
    val crc = new java.util.zip.CRC32()
    crc.update(b)
    val w = if (b.length > 0) (b(0) & 0xff) + 1 else 1
    val h = if (b.length > 1) (b(1) & 0xff) + 1 else 1
    val brightness = if (b.isEmpty) 0.0 else b.map(_ & 0xff).sum.toDouble / b.length
    MediaFeature(r.media_id, r.format, b.length, w, h, crc.getValue, brightness, 0, 0L)
  }

  final case class MediaResized(
      media_id: Long, format: String, orig_width: Int, orig_height: Int,
      width: Int, height: Int, media: Array[Byte])

  /** REAL bounded-box image resize (JDK `java.awt` bilinear scaling +
    * PNG re-encode): scale so max(w, h) == maxDim, aspect preserved,
    * never upscaled. Already-small images and non-decodable bodies
    * pass through byte-identical (orig dims zero when undecodable) —
    * a resize stage must never drop or corrupt assets it cannot
    * improve. Same bounded-batch partition shape as the decoder.
    */
  def resizeImages(ds: Dataset[MediaRow], maxDim: Int): Dataset[MediaResized] = {
    import ds.sparkSession.implicits._
    require(maxDim >= 1, s"maxDim=$maxDim must be positive")
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.map(resizeOne(_, maxDim))))
  }

  private[operators] def resizeOne(r: MediaRow, maxDim: Int): MediaResized = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(r.media))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null)
      MediaResized(r.media_id, r.format, 0, 0, 0, 0, r.media)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      if (math.max(w, h) <= maxDim)
        MediaResized(r.media_id, r.format, w, h, w, h, r.media)
      else {
        val scale = maxDim.toDouble / math.max(w, h)
        val nw = math.max(1, math.round(w * scale).toInt)
        val nh = math.max(1, math.round(h * scale).toInt)
        val out = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        MediaResized(r.media_id, "png", w, h, nw, nh, bos.toByteArray)
      }
    }
  }

  final case class MediaHash(media_id: Long, format: String, ahash: Long)

  /** Perceptual average-hash (aHash) of each decodable image: box-
    * average the pixel grid down to 8×8 luma cells (MANUAL integer
    * cell sums — `Graphics2D` scaling goes through a platform
    * rendering pipeline whose output is not bit-stable across JVMs;
    * exact sums are), threshold each cell against the cell-mean, pack
    * 64 bits MSB-first. Two images a crop/re-encode/brightness-jitter
    * apart land within a few bits — feed the result to
    * [[TextDedup.hammingPairs64]] for the banded near-dup pair sweep
    * (the image tier of the dedup family). Non-decodable bodies drop
    * (the hash of nothing is not 0 — absence, not a sentinel).
    */
  def aHashes(ds: Dataset[MediaRow]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.flatMap(aHashOne)))
  }

  private[operators] def aHashOne(r: MediaRow): Option[MediaHash] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(r.media))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val cx = math.min(7, x * 8 / w)
          val rgb = img.getRGB(x, y)
          val luma = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          sums(cy * 8 + cx) += luma
          cnts(cy * 8 + cx) += 1
          x += 1
        }
        y += 1
      }
      // integer-exact threshold: per-cell averages as 2^20-scaled
      // fixed point (no double rounding; overflow-safe below ~10^10
      // pixels per cell), mean over cells in the same fixed point
      val avgs = Array.tabulate(64)(i =>
        if (cnts(i) == 0) 0L else (sums(i) << 20) / cnts(i))
      val mean = avgs.sum / 64
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (avgs(i) > mean) hash |= (1L << (63 - i))
        i += 1
      }
      Some(MediaHash(r.media_id, r.format, hash))
    }
  }

  /** Deterministic grayscale 8×8 PNG rendering of a numeric vector
    * (component i → pixel i, linear clamp to [0,255]) — the
    * embedding-to-image encoder behind the registered image-dedup
    * demo and the specs: real PNG bytes, real decode on the way back.
    */
  private[graft] def grayPng8x8(values: Seq[Double]): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < 64) {
      val v = if (i < values.length) values(i) else 0.0
      val p = math.max(0, math.min(255, math.round(128.0 + v * 64.0).toInt))
      im.getRaster.setSample(i % 8, i / 8, 0, p)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  final case class MediaFrame(
      media_id: Long, frame_ix: Int, byte_offset: Long, frame: Array[Byte])

  /** Frame sampling for video containers. The JDK ships NO video
    * codec, so the frame CONTENT is a clearly-declared deterministic
    * stand-in (fixed-size byte slices at k uniform offsets); the
    * Spark side — the 1-row→k-rows expansion, bounded batches, the
    * (asset, frame_ix, offset) schema a JNI/codec decoder would fill
    * — is the real pipeline and is what the spec pins.
    */
  def sampleFrames(ds: Dataset[MediaRow], k: Int,
                   frameBytes: Int = 256): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    require(k >= 1 && frameBytes >= 1, s"k=$k frameBytes=$frameBytes must be positive")
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.flatMap { r =>
      val len = r.media.length
      if (len == 0) Iterator.empty
      else (0 until k).iterator.map { i =>
        val off = (len.toLong * i) / k
        val end = math.min(off + frameBytes, len.toLong).toInt
        MediaFrame(r.media_id, i, off, java.util.Arrays.copyOfRange(r.media, off.toInt, end))
      }
    }))
  }

  /** Partition-wise batched feature extraction. The `grouped` iterator
    * bounds per-batch memory exactly like an Arrow batch in
    * mapInPandas; no partition is ever materialized whole.
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.map(decode)))
  }

  /** DataFrame adapter for the query registry. */
  def featuresOf(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractFeatures(df.as[MediaRow]).toDF()
  }

  final case class MediaColorStats(
      media_id: Long, format: String, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, std_luma: Double)

  /** Per-channel color statistics over a REAL decode — the
    * channel-level profile next to [[extractFeatures]]'s single
    * brightness scalar: R/G/B means plus the luma standard deviation
    * (the contrast proxy a quality gate thresholds — near-zero std =
    * a flat/blank asset). Same bounded-pixel discipline as the
    * feature decode (stride-sampled grid capped at ~2¹⁶ pixels, so a
    * 100-megapixel asset costs what a thumbnail costs), same
    * batched-iterator memory bound, same drop-on-corrupt behavior.
    * Sums are exact integers; each mean is one division, the variance
    * is the integer-moment form E[x²]−E[x]² over exact sums.
    */
  def colorStats(ds: Dataset[MediaRow]): Dataset[MediaColorStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.flatMap(colorStatsOne)))
  }

  private[operators] def colorStatsOne(r: MediaRow): Option[MediaColorStats] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(r.media))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val stride = math.max(1, math.ceil(math.sqrt(w.toDouble * h / 65536.0)).toInt)
      var (sr, sg, sb, sl, sl2, n) = (0L, 0L, 0L, 0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val (cr, cg, cb) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          val luma = cr + cg + cb
          sr += cr; sg += cg; sb += cb
          sl += luma; sl2 += luma.toLong * luma
          n += 1
          x += stride
        }
        y += stride
      }
      if (n == 0) None
      else {
        val meanL = sl.toDouble / n
        val varL = sl2.toDouble / n - meanL * meanL
        Some(MediaColorStats(r.media_id, r.format, w, h,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
          math.sqrt(math.max(0.0, varL)) / 3.0))
      }
    }
  }

  final case class MediaSpectral(
      media_id: Long, band: Int, lo_hz: Double, hi_hz: Double,
      energy: Double, energy_share: Double, sample_rate: Int, n_samples: Int)

  /** Minimal RIFF/WAV writer (16-bit PCM mono, little-endian) — the
    * audio twin of [[grayPng8x8]]: render a numeric vector into a
    * REAL asset so the audio pipeline is exercised through the actual
    * JDK codec, not a stub. Samples clamp to [−1, 1].
    */
  def wavPcm16(samples: Seq[Double], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    samples.foreach { s =>
      bb.putShort((math.max(-1.0, math.min(1.0, s)) * 32767.0).toShort)
    }
    bb.array()
  }

  /** Minimal RIFF/AVI (Motion-JPEG) writer — the VIDEO twin of
    * [[grayPng8x8]]/[[wavPcm16]]: wrap already-encoded JPEG frames in
    * a real AVI container (`hdrl` with the `avih` timing header +
    * `movi` with one `00dc` chunk per frame) so the video pipeline is
    * exercised through an actual demux + actual per-frame image
    * decode, not a stand-in.
    */
  def mjpegAvi(frames: Seq[Array[Byte]], microSecPerFrame: Int = 40000): Array[Byte] = {
    require(frames.nonEmpty, "mjpegAvi needs at least one frame")
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = bodies.flatten.toArray
      val bb = java.nio.ByteBuffer.allocate(12 + inner.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + inner.length)
        .put(listType.getBytes("US-ASCII")).put(inner)
      bb.array()
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length) // dwTotalFrames
      chunk("avih", bb.array())
    }
    val hdrl = list("hdrl", Seq(avih))
    val movi = list("movi", frames.map(chunk("00dc", _)))
    val inner = hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(12 + inner.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + inner.length)
      .put("AVI ".getBytes("US-ASCII")).put(inner)
    bb.array()
  }

  /** RIFF/AVI demux: walk the chunk tree and return every video-frame
    * payload (`##dc`/`##db` chunks) as (frame_ix, byte_offset, bytes),
    * plus the `avih` micro-seconds-per-frame when present. Pure JDK
    * byte walking — the same discipline as the RIFF/WAV reader; any
    * structural violation returns an empty frame list (drop-on-
    * corrupt, never a task failure).
    */
  private[graft] def aviDemux(bytes: Array[Byte]): (Seq[(Int, Long, Array[Byte])], Long) = {
    try {
      if (bytes.length < 12 ||
          new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
          new String(bytes, 8, 4, "US-ASCII") != "AVI ")
        return (Seq.empty, 0L)
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Array[Byte])]
      var microPerFrame = 0L
      def le32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val fourcc = new String(bytes, p, 4, "US-ASCII")
          val size = le32(p + 4)
          val bodyStart = p + 8
          val bodyEnd = bodyStart + size
          if (size < 0 || bodyEnd > end) return // truncated — stop cleanly
          if (fourcc == "LIST" && size >= 4) {
            walk(bodyStart + 4, bodyEnd.toInt)
          } else if (fourcc.length == 4 &&
              (fourcc.endsWith("dc") || fourcc.endsWith("db")) &&
              fourcc.take(2).forall(_.isDigit)) {
            frames += ((frames.length, bodyStart.toLong,
              java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd.toInt)))
          } else if (fourcc == "avih" && size >= 4) {
            microPerFrame = le32(bodyStart)
          }
          p = (bodyEnd + (size % 2)).toInt // chunks pad to even
        }
      }
      walk(12, bytes.length)
      (frames.toSeq, microPerFrame)
    } catch { case scala.util.control.NonFatal(_) => (Seq.empty, 0L) }
  }

  /** Real video decode for MJPEG-in-AVI: demux the container, decode
    * the FIRST frame for true width/height, average the per-frame
    * brightness over ≤ 4 uniformly-sampled REAL frames, and derive
    * the duration from the `avih` timing header × frame count. Any
    * non-AVI/non-MJPEG body falls back to the stub via None (the
    * JDK-boundary rule: only what a JDK codec path can actually
    * decode claims to be real).
    */
  private[operators] def decodeVideo(r: MediaRow): Option[MediaFeature] = {
    val (frames, microPerFrame) = aviDemux(r.media)
    if (frames.isEmpty) return None
    val m = math.min(4, frames.length)
    val probeIdx = (0 until m).map(i => (frames.length.toLong * i / m).toInt).distinct
    val probes = probeIdx.flatMap(i =>
      decodeImage(MediaRow(r.media_id, frames(i)._3, "jpg")))
    if (probes.isEmpty) return None
    val durMs = microPerFrame * frames.length / 1000
    val crc = new java.util.zip.CRC32()
    crc.update(r.media)
    Some(MediaFeature(r.media_id, r.format, r.media.length,
      probes.head.width, probes.head.height, crc.getValue,
      probes.map(_.brightness).sum / probes.length, 0, durMs))
  }

  final case class VideoFrameFeature(
      media_id: Long, frame_ix: Int, n_frames: Int,
      width: Int, height: Int, brightness: Double)

  /** Real per-frame features for video assets: demux, sample k frames
    * at uniform FRAME indices (not byte offsets — the real-content
    * upgrade over [[sampleFrames]]' declared stand-in), decode each
    * through javax.imageio. Undecodable frames and non-AVI assets are
    * dropped (the drop-on-corrupt discipline); the batched-iterator
    * memory bound matches [[extractFeatures]].
    */
  def videoFrameFeatures(ds: Dataset[MediaRow], k: Int): Dataset[VideoFrameFeature] = {
    import ds.sparkSession.implicits._
    require(k >= 1, s"k=$k must be positive")
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.flatMap { r =>
      val (frames, _) = aviDemux(r.media)
      if (frames.isEmpty) Iterator.empty
      else (0 until k).iterator
        .map(i => (frames.length.toLong * i / k).toInt).distinct
        .flatMap { ix =>
          decodeImage(MediaRow(r.media_id, frames(ix)._3, "jpg")).map(f =>
            VideoFrameFeature(r.media_id, ix, frames.length,
              f.width, f.height, f.brightness))
        }
    }))
  }

  /** JPEG twin of [[grayPng8x8]] — the frame encoder for the MJPEG
    * demo assets (ImageIO's baseline JPEG writer; deterministic for a
    * given JDK, which is all the rows-only video queries claim).
    */
  private[graft] def grayJpeg8x8(values: Seq[Double]): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < 64) {
      val v = if (i < values.length) values(i) else 0.0
      val p = math.max(0, math.min(255, math.round(128.0 + v * 64.0).toInt))
      im.getRaster.setSample(i % 8, i / 8, 0, p)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  /** Spectral band-energy features over REAL audio decode — the
    * frequency-domain companion of [[decodeAudio]]'s time-domain
    * amplitude: per asset, the first `window` 16-bit PCM samples
    * (zero-padded if shorter — an hour-long asset costs the same as a
    * jingle) run through an in-JVM radix-2 FFT, and the [0, Nyquist)
    * spectrum folds into `nBands` equal bands with linear energy +
    * share per band (share is a plain IEEE division; no dB/log in the
    * output, the log-free house rule). Emits one ROW PER BAND — a
    * flat sortable schema, never an array column (the driver-check
    * rule D37 established). Non-PCM-16 or undecodable assets emit
    * nothing. `mapPartitions` justified: opaque binary input.
    */
  def spectralBands(ds: Dataset[MediaRow], nBands: Int = 8,
                    window: Int = 1024): Dataset[MediaSpectral] = {
    require(nBands >= 1 && window >= 2 * nBands &&
      (window & (window - 1)) == 0, s"window=$window must be a power of " +
      s"two with at least 2 bins per band (nBands=$nBands)")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.iterator.flatMap(r =>
      spectralOne(r, nBands, window))))
  }

  private[operators] def spectralOne(r: MediaRow, nBands: Int,
                                     window: Int): Seq[MediaSpectral] = {
    val decoded =
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
        try {
          val f = in.getFormat
          if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
              f.getSampleSizeInBits != 16) None
          else {
            val ch = math.max(1, f.getChannels)
            val want = window * 2 * ch
            val buf = new Array[Byte](want)
            var filled = 0
            var k = in.read(buf, 0, want)
            while (k > 0 && filled + k < want) {
              filled += k; k = in.read(buf, filled, want - filled)
            }
            if (k > 0) filled += k
            val nFrames = filled / (2 * ch)
            val re = new Array[Double](window)
            var i = 0
            while (i < nFrames) {
              val off = i * 2 * ch // first channel of each frame
              val s =
                if (f.isBigEndian) (buf(off) << 8) | (buf(off + 1) & 0xff)
                else (buf(off + 1) << 8) | (buf(off) & 0xff)
              re(i) = s / 32768.0
              i += 1
            }
            if (nFrames == 0) None
            else Some((re, f.getSampleRate.toInt, nFrames))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    decoded.toSeq.flatMap { case (re, rate, nSamples) =>
      val mag2 = fftMag2(re)
      val perBand = mag2.length / nBands
      val energies = Array.tabulate(nBands) { b =>
        var e = 0.0
        var k = b * perBand
        val end = (b + 1) * perBand
        while (k < end) { e += mag2(k); k += 1 }
        e
      }
      val total = energies.sum
      val nyquist = rate / 2.0
      (0 until nBands).map { b =>
        MediaSpectral(r.media_id, b,
          nyquist * b / nBands, nyquist * (b + 1) / nBands,
          energies(b), if (total == 0.0) 0.0 else energies(b) / total,
          rate, nSamples)
      }
    }
  }

  /** In-place iterative radix-2 Cooley–Tukey; returns |X_k|² for
    * k < n/2 (the real-signal half-spectrum). Pure JVM math —
    * deterministic across executors.
    */
  private[operators] def fftMag2(signal: Array[Double]): Array[Double] = {
    val n = signal.length
    val re = signal.clone()
    val im = new Array[Double](n)
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while (j >= bit) { j -= bit; bit >>= 1 }
      j += bit
      if (i < j) {
        val t = re(i); re(i) = re(j); re(j) = t
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val (wr, wi) = (math.cos(ang), math.sin(ang))
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k
          val b = a + len / 2
          val tr = re(b) * cr - im(b) * ci
          val ti = re(b) * ci + im(b) * cr
          re(b) = re(a) - tr; im(b) = im(a) - ti
          re(a) += tr; im(a) += ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    Array.tabulate(n / 2)(k => re(k) * re(k) + im(k) * im(k))
  }
}
