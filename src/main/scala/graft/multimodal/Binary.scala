package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batch-shaped partition passes.
  *
  * The real decode step (image/audio libs) is STUBBED — this container has
  * no codecs — but the Spark-side contract is real and tested: schema
  * (payload binary + typed meta), partition-parallel batched extraction
  * (the Scala analog of a `mapInPandas` batch UDF: one iterator pass per
  * partition, reusable buffers, no per-row driver involvement), and a
  * deterministic fake feature so tests have stable goldens.
  *
  * Reference analog: the `*_hi` BinaryDocValues side-store of feature
  * histograms (`/root/reference/.../solr/BinaryDocValuesField.java:61-127`)
  * and the decode->extract consumer loop of ParallelSolrIndexer.
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

  /** STUB decode + feature extraction: a deterministic byte-histogram
    * "feature" (8 bins over the byte value space, L1-normalized). A real
    * deployment swaps `extractOne` for the codec call; the batching shape
    * (per-partition iterator, batch buffer of `batchSize`) is what a GPU /
    * native-lib integration needs and is what the test pins down.
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

  /** The swappable decode stub (deterministic fake). */
  def extractOne(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatureBins)
    if (payload == null || payload.isEmpty) return bins
    payload.foreach(b => bins((b & 0xff) >> 5) += 1f)
    val total = payload.length.toFloat
    bins.map(_ / total)
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
