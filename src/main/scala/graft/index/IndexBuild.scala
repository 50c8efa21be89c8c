package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Tokenizer

/** 64-bit FNV-1a term hash — the compact query-filter key stored next to
  * the term string. Collisions are tolerated: group/merge keys always use
  * the term STRING; term_id exists only to give parquet row-group pruning a
  * cheap fixed-width column (SURVEY.md §7.4 / O11).
  */
object TermHash {
  def hash(term: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = term.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** One tokenized posting before aggregation (dl inlined — see Codec). */
final case class TermPosting(term: String, docId: Long, tf: Int, dl: Int)

/** One (term, segment) posting sub-list — the unit phase 1 emits. */
final case class SegTermRow(
    seg_id: Long, term_id: Long, term: String,
    df: Int, max_tf: Int, min_dl: Int, postings: Array[Byte])

final case class IndexConfig(
    /** segment width = 1 << segShift docs; a segment is the salt unit of
      * the two-phase build AND the parallel unit of query traversal. */
    segShift: Int = 17,
    /** segments per checkpoint range: rangeShift = segShift + rangeSegsShift. */
    rangeSegsShift: Int = 6,
    /** shuffle width hint for the phase-1 groupByKey (0 = session default). */
    buildPartitions: Int = 0) {
  def rangeShift: Int = segShift + rangeSegsShift
  def segOf(docId: Long): Long = docId >>> segShift
  def rangeOf(docId: Long): Long = docId >>> rangeShift
  def localOf(docId: Long): Int = (docId & ((1L << segShift) - 1)).toInt
  def globalOf(segId: Long, local: Int): Long = (segId << segShift) | local.toLong
}

final case class BuildReport(
    rangesBuilt: Seq[Long], rangesSkipped: Seq[Long],
    nDocs: Long, sumDl: Long, buildMs: Long)

/** Inverted-index build: tokenize -> salted two-phase typed-Dataset
  * groupByKey -> delta-gap+varint segments -> per-range manifest with
  * lineage + checkpointed resume.
  *
  * Replaces the reference's ParallelSolrIndexer + Lucene segment build
  * (`/root/reference/.../indexing/ParallelSolrIndexer.java:312-359`):
  * its thread pool becomes task parallelism, its bounded queue the shuffle,
  * its Solr `<commit/>` the per-range manifest write (SURVEY.md §3.4).
  *
  * Layout under `indexDir`:
  *   segments/range=<r>/  (seg_id, term_id, term, df, max_tf, min_dl, postings)
  *   docmeta/range=<r>/   (doc_id, repo, path, commit, lang, sha, dl)
  *   manifest/range=<r>/  (range_id, n_docs, sum_dl, n_rows, checksum,
  *                         seg_shift, range_segs_shift, build_ms)
  *
  * Scale notes (the design constraints, not local behavior):
  *  - phase-1 group key is (term, seg): a hot term ("license") splits into
  *    one group per segment — group size is bounded by the segment width
  *    regardless of df, which is the skew guarantee (O9);
  *  - phase-2 re-ranges by seg_id so each output file is a contiguous
  *    doc-range segment, rows sorted by term_id inside for row-group
  *    pruning at query time;
  *  - ranges are the resume unit: manifest/range=r is written LAST, so its
  *    _SUCCESS implies segments+docmeta of that range are complete; redo is
  *    idempotent (overwrite). Global stats (N, avgdl, df) are SUMS of
  *    per-range/per-segment values — no global pass, build is
  *    embarrassingly parallel across ranges;
  *  - per-row sha256 recorded in docmeta + an order-independent xor
  *    checksum in the manifest (input_hint invariant).
  */
object IndexBuild {

  def segmentsDir(indexDir: String) = s"$indexDir/segments"
  def docmetaDir(indexDir: String) = s"$indexDir/docmeta"
  def manifestDir(indexDir: String) = s"$indexDir/manifest"

  /** Tokenize a corpus slice into postings (typed path; per-doc map-side
    * tf aggregation — no shuffle for tf).
    */
  def tokenized(spark: SparkSession, corpus: DataFrame): Dataset[TermPosting] = {
    import spark.implicits._
    corpus.select(col("doc_id"), col("content")).as[(Long, String)]
      .flatMap { case (docId, content) =>
        val terms = Tokenizer.termsScala(content)
        if (terms.isEmpty) Iterator.empty
        else {
          val dl = terms.length
          val counts = new java.util.HashMap[String, Int]()
          terms.foreach(t => counts.merge(t, 1, Integer.sum(_, _)))
          val out = new Array[TermPosting](counts.size())
          var i = 0
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            out(i) = TermPosting(e.getKey, docId, e.getValue, dl)
            i += 1
          }
          out.iterator
        }
      }
  }

  /** Phase 1: salted groupByKey((term, seg)) -> encoded sub-lists. */
  def phase1(spark: SparkSession, posts: Dataset[TermPosting], cfg: IndexConfig): Dataset[SegTermRow] = {
    import spark.implicits._
    posts
      .groupByKey(p => (p.term, cfg.segOf(p.docId)))
      .mapGroups { (key: (String, Long), it: Iterator[TermPosting]) =>
        val (term, segId) = key
        val buf = scala.collection.mutable.ArrayBuffer.empty[Codec.Posting]
        it.foreach(p => buf += Codec.Posting(cfg.localOf(p.docId), p.tf, p.dl))
        val arr = buf.sortBy(_.local).toArray
        var maxTf = 0
        var minDl = Int.MaxValue
        arr.foreach { p =>
          if (p.tf > maxTf) maxTf = p.tf
          if (p.dl < minDl) minDl = p.dl
        }
        SegTermRow(segId, TermHash.hash(term), term, arr.length, maxTf, minDl, Codec.encode(arr))
      }
  }

  /** List range ids already committed (manifest _SUCCESS present). */
  def doneRanges(spark: SparkSession, indexDir: String): Set[Long] = {
    val p = new Path(manifestDir(indexDir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("range="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("range=").toLong)
      .toSet
  }

  /** Build (or resume) the index for `corpus`; returns a report. */
  def build(spark: SparkSession, corpus: DataFrame, indexDir: String,
            cfg: IndexConfig = IndexConfig()): BuildReport = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val ranges = corpus
      .select((col("doc_id") / lit(1L << cfg.rangeShift)).cast("long").as("r"))
      .distinct().as[Long].collect().sorted
    val done = doneRanges(spark, indexDir)
    val (skip, todo) = ranges.partition(done.contains)
    var nDocs = 0L
    var sumDl = 0L
    todo.foreach { r =>
      val rt0 = System.nanoTime()
      val lo = r << cfg.rangeShift
      val hi = (r + 1) << cfg.rangeShift
      val slice = corpus.where(col("doc_id") >= lo && col("doc_id") < hi)
      val posts = tokenized(spark, slice)
      val p1 = phase1(spark, posts, cfg)
      // phase 2: partition-local segment files, term-sorted for row-group pruning
      val segParts = math.max(1, 1 << cfg.rangeSegsShift >> 2)
      p1.toDF()
        .repartitionByRange(segParts, col("seg_id"))
        .sortWithinPartitions(col("term_id"), col("seg_id"))
        .write.mode("overwrite").parquet(s"${segmentsDir(indexDir)}/range=$r")
      // docmeta (norms/identity side-store)
      val meta = slice.select(
        col("doc_id"), col("repo"), col("path"), col("commit"), col("lang"), col("sha"),
        size(Tokenizer.terms(col("content"))).as("dl"))
      meta.write.mode("overwrite").parquet(s"${docmetaDir(indexDir)}/range=$r")
      // manifest last: _SUCCESS == range committed
      val m = spark.read.parquet(s"${docmetaDir(indexDir)}/range=$r")
        .agg(
          sum(when(col("dl") > 0, 1L).otherwise(0L)).as("n_docs"),
          coalesce(sum(when(col("dl") > 0, col("dl").cast("long")).otherwise(0L)), lit(0L)).as("sum_dl"),
          count(lit(1)).as("n_rows"),
          coalesce(expr("bit_xor(xxhash64(concat_ws('|', doc_id, sha)))"), lit(0L)).as("checksum"))
        .withColumn("range_id", lit(r))
        .withColumn("seg_shift", lit(cfg.segShift))
        .withColumn("range_segs_shift", lit(cfg.rangeSegsShift))
        .withColumn("build_ms", lit((System.nanoTime() - rt0) / 1000000L))
      m.coalesce(1).write.mode("overwrite").parquet(s"${manifestDir(indexDir)}/range=$r")
      val row = spark.read.parquet(s"${manifestDir(indexDir)}/range=$r")
        .select("n_docs", "sum_dl").as[(Long, Long)].head()
      nDocs += row._1
      sumDl += row._2
    }
    BuildReport(todo.toSeq, skip.toSeq, nDocs, sumDl, (System.nanoTime() - t0) / 1000000L)
  }
}
