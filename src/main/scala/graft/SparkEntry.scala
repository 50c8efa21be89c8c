package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.query.Bm25
import graft.sql.Oracle

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry returns columns named identically to its `oracleSql` twin;
  * doubles are never emitted raw (quantized `*_q` BIGINT instead).
  */
object SparkEntry {

  /** Flagship multi-term query: hot words + 12-bit shingle hash terms +
    * one rare word ("dup", df≈25/500) — mirrors the reference's default
    * OR-of-hash-terms search (LireRequestHandler.java:559).
    */
  val FlagshipTerms: Seq[(String, Double)] =
    Seq("w:spark", "w:join", "w:hash", "w:dup", "s:75f", "s:420").map(_ -> 1.0)

  /** Boosted-term query, descending boosts — MetricSpaces-style T7
    * (`R%06d^%1.2f` boosts, SURVEY.md §2.6/T7).
    */
  val BoostedTerms: Seq[(String, Double)] =
    Seq("w:dup" -> 1.0, "s:7e3" -> 0.83, "w:window" -> 0.67,
      "s:89d" -> 0.5, "w:stream" -> 0.33, "w:merge" -> 0.17)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Bm25.scoreTopK(spark, Corpus.fromDocuments(spark, "/root/testdata/sf0.001"),
      FlagshipTerms, 60)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/F12: corpus source derivation + per-row sha256 invariant
    "q_corpus" -> ((s, dir) =>
      Corpus.fromDocuments(s, dir)
        .select("doc_id", "repo", "path", "commit", "lang", "content", "sha", "content_len")),
    // F1/F2/A5 analog: tokenize + shingle -> (doc_id, term, tf)
    "q_postings" -> ((s, dir) =>
      Bm25.postings(Corpus.fromDocuments(s, dir))),
    // A1: term dictionary (df, total_tf)
    "q_dictionary" -> ((s, dir) =>
      Bm25.dictionary(Bm25.postings(Corpus.fromDocuments(s, dir)))),
    // doc lengths (norms side-store analog of *_hi DocValues)
    "q_doclens" -> ((s, dir) =>
      Bm25.docLens(Bm25.postings(Corpus.fromDocuments(s, dir)))),
    // A2/A3/T3-T5: flagship BM25 top-k with tie-break
    "q_bm25_topk" -> ((s, dir) =>
      Bm25.scoreTopK(s, Corpus.fromDocuments(s, dir), FlagshipTerms, 60)),
    // T7: boosted-term BM25
    "q_bm25_boosted" -> ((s, dir) =>
      Bm25.scoreTopK(s, Corpus.fromDocuments(s, dir), BoostedTerms, 60)),
    // P2: fq filter-query intersection (lang = 'en')
    "q_bm25_filtered" -> ((s, dir) =>
      Bm25.scoreTopK(s, Corpus.fromDocuments(s, dir), FlagshipTerms, 60,
        docFilter = Some(col("lang") === lit("en")))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_corpus" -> Oracle.withPrelude(
      """SELECT c.doc_id, c.repo, c.path, c."commit", c.lang, c.content,
        |       sha256(c.content) AS sha, length(c.content)::BIGINT AS content_len
        |FROM corpus c""".stripMargin),
    "q_postings" -> Oracle.withPrelude("SELECT doc_id, term, tf FROM post"),
    "q_dictionary" -> Oracle.withPrelude("SELECT term, df, total_tf FROM dict"),
    "q_doclens" -> Oracle.withPrelude("SELECT doc_id, dl FROM dl"),
    "q_bm25_topk" -> Oracle.bm25TopK(FlagshipTerms, 60),
    "q_bm25_boosted" -> Oracle.bm25TopK(BoostedTerms, 60),
    "q_bm25_filtered" -> Oracle.bm25TopK(FlagshipTerms, 60, Some("lang = 'en'")),
  )
}
