package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batch-shaped partition passes.
  *
  * The decode step is REAL where a dependency-free codec exists: PNG and
  * JPEG payloads decode via `javax.imageio` (JDK built-in readers) into a
  * LIRE-style global luminance histogram, WAV (RIFF PCM 16-bit) payloads
  * parse directly from bytes into an amplitude histogram; everything else
  * keeps the deterministic byte-histogram fallback so the batch plumbing
  * stays exercisable on any corpus. Video remains represented by
  * [[frameSample]] (no JDK video codec exists). The Spark-side contract:
  * schema (payload binary + typed meta), partition-parallel batched
  * extraction (the Scala analog of a `mapInPandas` batch UDF: one iterator
  * pass per partition, no per-row driver involvement).
  *
  * Reference analog: the `*_hi` BinaryDocValues side-store of feature
  * histograms (`/root/reference/.../solr/BinaryDocValuesField.java:61-127`)
  * and the decode->extract consumer loop of ParallelSolrIndexer
  * (ParallelSolrIndexer.java:312-359, resize at :92-96).
  */
object Binary {
  val FeatureBins = 8

  /** Wrap a text corpus as a multimodal table: (doc_id, payload binary,
    * byte_len, sha, head_hex) — the metadata every opaque blob carries.
    */
  def asBinaryTable(corpus: DataFrame): DataFrame =
    corpus.select(
      col("doc_id"),
      encode(col("content"), "UTF-8").as("payload"),
      lower(hex(encode(substring(col("content"), 1, 8), "UTF-8"))).as("head_hex"))
      .select(
        col("doc_id"),
        col("payload"),
        length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("sha"),
        col("head_hex"))

  final case class BinRow(doc_id: Long, payload: Array[Byte])
  final case class FeatRow(doc_id: Long, feature: Array[Float], n_batches_seen: Int)

  /** Decode + feature extraction over the batch shape a GPU / native-lib
    * integration needs (per-partition iterator, batch buffer of
    * `batchSize`): image payloads decode via javax.imageio into a
    * luminance histogram ([[extractOne]]); everything else falls back to
    * the deterministic byte histogram.
    */
  def extractFeatures(spark: SparkSession, bin: DataFrame, batchSize: Int = 64): Dataset[FeatRow] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("payload")).as[BinRow]
      .mapPartitions { it =>
        // batch loop: mirrors mapInPandas' record-batch contract
        it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
          batch.map { r =>
            FeatRow(r.doc_id, extractOne(r.payload), bi + 1)
          }
        }
      }
  }

  /** Real decode where a JDK codec applies, deterministic fallback where
    * not: an image payload (PNG or JPEG) yields its global luminance
    * histogram (FeatureBins bins over integer lum = (299r+587g+114b)/1000,
    * L1-normalized — the shape of LIRE's global histogram features); a WAV
    * payload its PCM amplitude histogram ([[audioHistogram]]); other
    * payloads a byte-value histogram. Golden-pinned on checked-in fixtures
    * (src/test/resources/fixture.{png,jpg,wav}).
    */
  def extractOne(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatureBins)
    if (payload == null || payload.isEmpty) return bins
    decodeImage(payload) match {
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val lum = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
            bins(lum >> 5) += 1f
            x += 1
          }
          y += 1
        }
        val total = (w.toLong * h.toLong).toFloat
        bins.map(_ / total)
      case None =>
        audioHistogram(payload).getOrElse {
          payload.foreach(b => bins((b & 0xff) >> 5) += 1f)
          val total = payload.length.toFloat
          bins.map(_ / total)
        }
    }
  }

  /** PNG magic probe + ImageIO decode. The cheap 8-byte magic check keeps
    * the per-row cost of non-image payloads at a branch (no reader-registry
    * scan per text row); extend the probe set when more codecs matter.
    *
    * Hardened for hostile corpora: the declared IHDR dimensions are capped
    * BEFORE decoding (a 1 KB decompression bomb declaring 60000×60000
    * would otherwise allocate ~14 GB inside an executor), any decoder
    * throwable short of fatal falls back to None (the JDK PNG reader is
    * known to throw RuntimeExceptions on corrupt bodies — one bad row must
    * not fail the job), and ImageIO's default disk-backed stream cache is
    * disabled (it writes a temp file per decode in the partition hot loop).
    */
  val MaxImagePixels: Long = 64L * 1024 * 1024 // 64 MP ≈ 256 MB ARGB
  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  javax.imageio.ImageIO.setUseCache(false)
  def looksLikePng(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 8 &&
      java.util.Arrays.equals(payload, 0, 8, PngMagic, 0, 8)
  /** Declared (width, height) from the PNG IHDR (bytes 16-23, big-endian). */
  private def pngDims(p: Array[Byte]): (Long, Long) = {
    @inline def u32(off: Int): Long =
      ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
        ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
    if (p.length < 24) (0L, 0L) else (u32(16), u32(20))
  }
  def looksLikeJpeg(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 3 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
      (payload(2) & 0xff) == 0xff

  /** Declared (width, height) from the first JPEG SOF marker (0xFFC0-CF
    * except C4/C8/CC): segment-walk with bounds checks; (0,0) when absent
    * or malformed — the same pre-decode bomb cap as the PNG path.
    */
  private def jpegDims(p: Array[Byte]): (Long, Long) = {
    var i = 2
    while (i + 3 < p.length) {
      if ((p(i) & 0xff) != 0xff) return (0L, 0L)
      val marker = p(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else {
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > p.length) return (0L, 0L)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= p.length) return (0L, 0L)
          val h = ((p(i + 5) & 0xffL) << 8) | (p(i + 6) & 0xffL)
          val w = ((p(i + 7) & 0xffL) << 8) | (p(i + 8) & 0xffL)
          return (w, h)
        }
        i += 2 + len
      }
    }
    (0L, 0L)
  }

  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val dims =
      if (looksLikePng(payload)) Some(pngDims(payload))
      else if (looksLikeJpeg(payload)) Some(jpegDims(payload))
      else None
    dims match {
      case Some((w, h)) if w > 0 && h > 0 && w * h <= MaxImagePixels =>
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
  }

  /** WAV (RIFF/WAVE, PCM 16-bit) amplitude histogram — a REAL audio
    * decode with no library beyond the bytes: the RIFF chunk list is
    * walked to the `fmt ` (must declare PCM format 1, 16-bit) and `data`
    * chunks, and every little-endian int16 sample bins by magnitude
    * (|s| >> 12 -> 8 bins, L1-normalized). Deterministic, bounds-checked,
    * None for anything that is not exactly this shape (fallback handles
    * it). The video analog stays [[frameSample]].
    */
  def audioHistogram(p: Array[Byte]): Option[Array[Float]] = {
    if (p == null || p.length < 44) return None
    def tag(off: Int, s: String): Boolean =
      (0 until 4).forall(k => (p(off + k) & 0xff) == s.charAt(k))
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    @inline def u16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    @inline def u32(off: Int): Long =
      (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    var i = 12
    var pcm16 = false
    while (i + 8 <= p.length) {
      val size = u32(i + 4)
      if (size < 0 || i + 8 + size > p.length) return None
      if (tag(i, "fmt ")) {
        if (size < 16) return None
        pcm16 = u16(i + 8) == 1 && u16(i + 8 + 14) == 16
      } else if (tag(i, "data")) {
        if (!pcm16) return None // fmt must precede data and be PCM 16-bit
        val bins = new Array[Float](FeatureBins)
        val n = (size / 2).toInt
        if (n == 0) return None
        var k = 0
        while (k < n) {
          val s = (u16(i + 8 + 2 * k)).toShort.toInt
          val mag = math.min(math.abs(s), 32767)
          bins(math.min(FeatureBins - 1, mag >> 12)) += 1f
          k += 1
        }
        return Some(bins.map(_ / n.toFloat))
      }
      i += 8 + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** Real image resize (the reference's max-side-512 preprocessing,
    * ParallelSolrIndexer.java:92-96): bilinear scale so the longer side is
    * `maxSide`, re-encoded as PNG. None when the payload is not a decodable
    * image; the payload unchanged when it is already small enough.
    */
  def resizeImageBytes(payload: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    decodeImage(payload).map { img =>
      val side = math.max(img.getWidth, img.getHeight)
      if (side <= maxSide) payload
      else {
        val scale = maxSide.toDouble / side
        val w = math.max(1, math.round(img.getWidth * scale).toInt)
        val h = math.max(1, math.round(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        baos.toByteArray
      }
    }

  /** Frame sampling over an opaque payload (the video frame-sample
    * analog): fixed-width frames taken every `stride` frames — frame j
    * covers characters [j·width·stride + 1, width]; payloads shorter than
    * one frame yield no rows. Emits the frame IDENTITY (sha) rather than
    * the bytes so the downstream table stays narrow; swap sha2 for the
    * frame payload column when a decoder consumes it. Per-row columnar
    * expression — no shuffle, prunes to (doc_id, content) at the scan.
    * Output (doc_id, frame_idx, frame_sha).
    */
  def frameSample(corpus: DataFrame, width: Int, stride: Int): DataFrame = {
    val step = width * stride
    corpus
      .where(length(col("content")) >= width)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((length(col("content")) - width) / step).cast("int")),
          j => sha2(encode(col("content").substr(j * step + 1, lit(width)), "UTF-8"), 256))))
      .toDF("doc_id", "frame_idx", "frame_sha")
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"), col("frame_sha"))
  }

  /** Resize stub (the reference resizes images to max side 512 before
    * feature extraction, ParallelSolrIndexer.java:92-96): deterministic
    * downsample keeping every `factor`-th character, with the metadata a
    * real resize would carry. Typed partition pass (mapInPandas-shaped,
    * like [[extractFeatures]]); swap [[resizeOne]] for a codec call.
    * Output (doc_id, orig_len, new_len, resized_sha).
    */
  def resize(spark: SparkSession, corpus: DataFrame, factor: Int): DataFrame = {
    import spark.implicits._
    corpus.select(col("doc_id"), col("content")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, content) =>
          val resized = resizeOne(content, factor)
          md.reset()
          val sha = graft.analyze.Tokenizer.hexOf(
            md.digest(resized.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          (id, content.length.toLong, resized.length.toLong, sha)
        }
      }
      .toDF("doc_id", "orig_len", "new_len", "resized_sha")
  }

  /** The swappable resize stub: every factor-th character. */
  def resizeOne(content: String, factor: Int): String = {
    if (content == null || content.isEmpty) return ""
    val sb = new StringBuilder(content.length / factor + 1)
    var i = 0
    while (i < content.length) { sb.append(content.charAt(i)); i += factor }
    sb.result()
  }
}
