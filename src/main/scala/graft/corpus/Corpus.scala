package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus derivation + synthesis.
  *
  * The engine's input contract (BASELINE.json `input_hint`) is an
  * Iceberg-shaped table of source files:
  *   (repo string, path string, commit string, lang string, content string)
  *
  * Two providers:
  *  - [[fromDocuments]]: deterministic derivation from the driver's
  *    `documents.parquet` (TESTDATA.md) — pure column functions of the
  *    input so the DuckDB oracle reproduces it exactly. Used by
  *    SparkEntry.queries / Verify.
  *  - [[synthesize]]: seeded volume generator (Zipfian token mix with
  *    deliberately hot "license-header" terms, log-normal sizes) carried by
  *    `lineitem` row keys — used by Bench and the scale tests, where no SQL
  *    oracle is needed.
  *
  * Per-row invariant (input_hint): `sha = sha2(content, 256)` recorded with
  * the index and re-checked against the source snapshot (reference analog:
  * the id/doc identity the Solr unique key enforces,
  * `/root/reference/...lire/conf/managed-schema:176`).
  */
object Corpus {

  /** The corpus table for a TESTDATA sf dir. Columns:
    * doc_id, repo, path, commit, lang, content, sha, content_len.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.select(
      col("doc_id"),
      col("source").as("repo"),
      concat(lit("repo/"), col("source"), lit("/doc_"), col("doc_id"), lit(".txt")).as("path"),
      substring(md5(concat(col("source"), lit(":"), col("doc_id"))), 1, 12).as("commit"),
      col("lang"),
      coalesce(col("text"), lit("")).as("content"))
      .withColumn("sha", sha2(col("content"), 256))
      .withColumn("content_len", length(col("content")).cast("long"))
  }

  /** Assign dense, deterministic doc_ids to an input_hint-shaped table
    * (repo, path, commit, lang, content) that has none (SURVEY.md §7.4):
    * range-repartition by the natural key (repo, path, commit), sort within
    * partitions, id = partitionId << 33 | rowIndex. Stable across runs for
    * a fixed `partitions`; monotone within a partition (what delta-gap
    * compression needs); id space per partition bounded at 2^33 rows.
    * Also derives the `sha` invariant column if absent.
    */
  def withDocIds(df: DataFrame, partitions: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val base = if (df.columns.contains("sha")) df
      else df.withColumn("sha", sha2(coalesce(col("content"), lit("")), 256))
    val arranged = base
      .repartitionByRange(partitions, col("repo"), col("path"), col("commit"))
      .sortWithinPartitions(col("repo"), col("path"), col("commit"))
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: arranged.schema.fields)
    arranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      require(pid < (1L << 30), "partition count out of id-space")
      it.zipWithIndex.map { case (row, i) =>
        require(i.toLong < (1L << 33), "partition row count out of id-space")
        Row.fromSeq((pid << 33 | i.toLong) +: row.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Seeded synthetic corpus of `n` files for bench/scale runs.
    *
    * Token distribution: ~2000-word Zipfian vocabulary + 8 hot terms that
    * appear in EVERY file (license-header analog — the skew the salted
    * two-phase build must absorb, SURVEY.md §7.6/O9). Sizes roughly
    * log-normal (median ~120 tokens). Fully deterministic in (seed, n):
    * content is a pure function of the row index via splittable
    * hash-counters — no RNG state order dependence, so any partitioning
    * yields the same corpus.
    */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L,
                 partitions: Int = 64): DataFrame = {
    import spark.implicits._
    val vocabB = spark.sparkContext.broadcast(SynthVocab.vocab)
    val hot = SynthVocab.hotTerms
    val df = spark.range(0, n, 1, partitions).mapPartitions { it =>
      val vocab = vocabB.value
      it.map { id =>
        val content = SynthVocab.content(id, seed, vocab, hot)
        val repo = s"repo${java.lang.Long.remainderUnsigned(SynthVocab.mix(id ^ seed), 200)}"
        val lang = SynthVocab.langs(((id % 4) + 4).toInt % 4)
        (id, repo, s"src/f$id.$lang", f"${SynthVocab.mix(id + seed)}%016x", lang, content)
      }
    }.toDF("doc_id", "repo", "path", "commit", "lang", "content")
    df.withColumn("sha", sha2(col("content"), 256))
      .withColumn("content_len", length(col("content")).cast("long"))
  }
}

private[graft] object SynthVocab {
  val langs: Array[String] = Array("scala", "java", "py", "c")

  /** 8 hot terms present in every synthetic file (Zipf head / skew driver). */
  val hotTerms: Array[String] = Array(
    "license", "apache", "copyright", "version",
    "import", "public", "return", "the")

  /** ~2000-token vocabulary: code-ish identifiers, deterministic. */
  val vocab: Array[String] = {
    val roots = Array(
      "get", "set", "map", "list", "hash", "join", "merge", "sort", "scan",
      "index", "term", "query", "score", "doc", "field", "value", "key",
      "node", "tree", "heap", "block", "page", "file", "read", "write",
      "open", "close", "init", "build", "parse", "token", "byte", "util",
      "spark", "batch", "stream", "part", "shard", "codec", "sum", "count")
    val suffixes = Array("", "er", "ed", "s", "Impl", "Factory", "0", "1",
      "2", "Buf", "Ctx", "Id", "Len", "Max", "Min", "Pos", "Ref", "Tmp",
      "Var", "X", "Y", "Z", "Acc", "Arr", "Bit", "Cap", "Dim", "End",
      "Fn", "Gen", "Hi", "Lo", "Mid", "Nxt", "Off", "Ord", "Ptr", "Q",
      "Raw", "Seg", "Seq", "Sig", "Sz", "Tag", "Top", "Ts", "Ty", "Ix", "Nm")
    for (r <- roots; s <- suffixes) yield r + s
  }

  /** splitmix64 finalizer — stateless splittable hash. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic content for file `id`: hot header + Zipfian body. */
  def content(id: Long, seed: Long, vocab: Array[String], hot: Array[String]): String = {
    val h = mix(id * 0x100000001b3L + seed)
    // log-normal-ish length: exp of a centered sum of two uniforms
    val u1 = (mix(h + 1) >>> 11).toDouble / (1L << 53).toDouble
    val u2 = (mix(h + 2) >>> 11).toDouble / (1L << 53).toDouble
    val len = math.min(2000, (24 * math.exp(1.6 * (u1 + u2)))).toInt.max(8)
    val sb = new StringBuilder(len * 8)
    var i = 0
    while (i < hot.length) { sb.append(hot(i)).append(' '); i += 1 }
    var k = 0
    while (k < len) {
      val r = (mix(h + 16 + k) >>> 11).toDouble / (1L << 53).toDouble
      // Zipf-ish rank via inverse power law over the vocab
      val rank = math.min(vocab.length - 1,
        (math.pow(vocab.length.toDouble, r) - 1.0).toInt)
      sb.append(vocab(rank))
      sb.append(if (k % 12 == 11) ";\n" else " ")
      k += 1
    }
    sb.result()
  }
}
