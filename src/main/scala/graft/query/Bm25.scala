package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.analyze.Tokenizer

/** BM25 scoring — the semantic baseline (SURVEY.md §7.3).
  *
  * The reference's phase-1 ranking is Lucene `BM25Similarity` with defaults
  * k1=1.2, b=0.75 (no custom <similarity> in the schema —
  * `/root/reference/src/main/docker/lire-sample-core.tar.gz!lire/conf/managed-schema:1006-1016`
  * commented out; luceneMatchVersion 7.5, solrconfig.xml:38). We reproduce
  * the closed form
  *
  *   score(d, q) = Σ_{t∈q} boost(t) · idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
  *
  * in full double precision (no Lucene norm-byte quantization — our engine,
  * brute scorer and the DuckDB oracle all use the same exact formula, which
  * is what rank-identity is defined against).
  *
  * Everything in this file is pure DataFrame/Catalyst — it is the
  * *semantic* path every optimized path (segments + block-max WAND,
  * [[graft.query.Wand]]) must stay rank-identical to.
  *
  * Determinism note: raw double scores depend on float summation order, so
  * ranking and cross-engine comparison use `score_q = round(score·1e6)`
  * (BIGINT); ordering is (score_q DESC, doc_id ASC) — the reference's
  * tie-break rule (distance asc, docId asc —
  * `.../solr/CachingSimpleResult.java:12-24`) transposed to
  * descending-score space, made quantization-stable.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75
  /** score quantum for cross-engine comparison / tie-breaks. */
  val Quant = 1e6

  def idf(df: Double, n: Double): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  def tfNorm(tf: Double, dl: Double, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  def idfCol(df: Column, n: Column): Column =
    log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))

  def tfNormCol(tf: Column, dl: Column, avgdl: Column): Column =
    tf * lit(K1 + 1.0) / (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl))

  /** corpus(doc_id, content, ...) -> postings(doc_id, term, tf:long).
    * Tokenization via the native [[graft.functions.GraftTerms]] expression
    * (same output as Tokenizer.terms, ~10x faster — see its scaladoc).
    * tf saturates at [[graft.index.IndexBuild.MaxTf]] — the same clamp the
    * packed index postings apply, so the semantic path, the index path and
    * the oracle agree even on a pathological minified/generated doc.
    */
  def postings(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.graft_terms(col("content"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(least(count(lit(1)), lit(graft.index.IndexBuild.MaxTf.toLong)).as("tf"))

  /** corpus -> doc lengths (doc_id, dl:long): the RAW analyzed term count
    * (2n−1) saturated at [[graft.index.IndexBuild.MaxDl]] — identical to
    * the index docmeta's dl (clamping the raw count, NOT the sum of
    * already-clamped tfs). Docs with no terms are absent (they can never
    * match; N/avgdl are defined over indexed docs).
    */
  def docLens(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"),
        least(graft.functions.GraftFunctions.graft_doclen(col("content")).cast("long"),
          lit(graft.index.IndexBuild.MaxDl.toLong)).as("dl"))
      .where(col("dl") > 0)

  /** postings -> dictionary (term, df:long, total_tf:long). The reference's
    * HashTermStatistics full-TermsEnum walk
    * (`.../solr/HashTermStatistics.java:23-39`) as one aggregation.
    */
  def dictionary(post: DataFrame): DataFrame =
    post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))

  /** Semantic BM25 top-k, one lazy DataFrame plan (no driver actions):
    * postings ⋈ broadcast(query terms) ⋈ dl, × broadcast 1-row stats,
    * groupBy(doc) sum, order by (score_q desc, doc_id asc), limit k.
    */
  def scoreTopK(
      spark: SparkSession,
      corpus: DataFrame,
      terms: Seq[(String, Double)],
      k: Int,
      docFilter: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val post = postings(corpus)
    val dl = docLens(corpus)
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val dict = dictionary(post)
    val q = terms.toDF("term", "boost")
    val base = docFilter match {
      case Some(f) => post.join(corpus.where(f).select("doc_id"), Seq("doc_id"), "left_semi")
      case None => post
    }
    val scored = base
      .join(broadcast(q), Seq("term"))
      .join(broadcast(dict), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"),
        (col("boost") * idfCol(col("df").cast("double"), col("n")) *
          tfNormCol(col("tf").cast("double"), col("dl").cast("double"), col("avgdl"))).as("part"))
      .groupBy(col("doc_id"))
      .agg(sum(col("part")).as("score"))
      .withColumn("score_q", round(col("score") * lit(Quant)).cast("long"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_q").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_q"))
  }
}

/** Independent brute-force reference scorer (pure Scala, no Spark, no
  * index) — the third implementation rank-identity is tested against
  * (SURVEY.md §5.2-2; analog of asserting against Lucene phase-1 output).
  */
object BruteScorer {
  final case class Scored(docId: Long, score: Double) {
    def scoreQ: Long = math.round(score * Bm25.Quant)
  }

  /** docs: (docId, content). Returns top-k by (score_q desc, docId asc).
    * Applies the same MaxTf/MaxDl saturation as the packed index postings.
    */
  def topK(docs: Seq[(Long, String)], terms: Seq[(String, Double)], k: Int): Seq[Scored] = {
    import graft.index.IndexBuild.{MaxDl, MaxTf}
    val termCounts: Map[Long, Map[String, Int]] =
      docs.iterator.map { case (id, c) =>
        id -> Tokenizer.termsScala(c).groupBy(identity).view
          .mapValues(ts => math.min(ts.length, MaxTf)).toMap
      }.filter(_._2.nonEmpty).toMap
    val n = termCounts.size.toDouble
    val dls = docs.iterator.collect {
      case (id, c) if termCounts.contains(id) =>
        id -> math.min(Tokenizer.dlOf(Tokenizer.tokenCountScala(c)), MaxDl).toDouble
    }.toMap
    val avgdl = dls.values.sum / n
    val df: Map[String, Int] =
      termCounts.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    val scored = termCounts.iterator.flatMap { case (id, tc) =>
      // fixed summation order: query-term list order (matches engine re-score)
      var s = 0.0
      var hit = false
      terms.foreach { case (t, boost) =>
        tc.get(t).foreach { tf =>
          hit = true
          s += boost * Bm25.idf(df(t).toDouble, n) * Bm25.tfNorm(tf.toDouble, dls(id), avgdl)
        }
      }
      if (hit) Some(Scored(id, s)) else None
    }.toSeq
    scored.sortBy(s => (-s.scoreQ, s.docId)).take(k)
  }
}
