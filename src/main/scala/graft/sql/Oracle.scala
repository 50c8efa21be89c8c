package graft.sql

/** DuckDB oracle SQL builder.
  *
  * Mirrors the corpus derivation ([[graft.corpus.Corpus.fromDocuments]]),
  * the tokenizer ([[graft.analyze.Tokenizer]]) and the BM25 closed form
  * ([[graft.query.Bm25]]) in ANSI-ish SQL that DuckDB runs directly on the
  * same parquet tables. Keeping all three in one repo-local definition is
  * the rank-identity contract (SURVEY.md §5.2-3).
  *
  * Cross-engine gotchas encoded here:
  *  - DuckDB `sum(BIGINT)` returns HUGEINT -> always `::BIGINT` casts;
  *  - doubles never compared raw: `score_q = CAST(round(score*1e6) AS BIGINT)`;
  *  - ordering always (score_q DESC, doc_id ASC) — quantization-stable
  *    version of the reference tie-break (CachingSimpleResult.java:12-24).
  */
object Oracle {

  /** CTE prelude: corpus -> toks -> terms -> post -> dl -> stats -> dict. */
  val prelude: String =
    """corpus AS (
      |  SELECT doc_id,
      |         source AS repo,
      |         'repo/' || source || '/doc_' || doc_id || '.txt' AS path,
      |         substr(md5(source || ':' || doc_id), 1, 12) AS "commit",
      |         lang,
      |         coalesce(text, '') AS content
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, lang,
      |         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS ts
      |  FROM corpus),
      |terms AS (
      |  SELECT doc_id, 'w:' || unnest(ts) AS term FROM toks
      |  UNION ALL
      |  SELECT doc_id, 's:' || substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 3) AS term
      |  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
      |post AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM post GROUP BY 1),
      |stats AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dl),
      |dict AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf FROM post GROUP BY 1)""".stripMargin

  def withPrelude(body: String): String = s"WITH $prelude\n$body"

  /** VALUES table for a weighted term list. */
  def termValues(terms: Seq[(String, Double)]): String =
    terms.map { case (t, b) => s"('$t', $b::DOUBLE)" }.mkString(", ")

  /** BM25 scored CTE over `post` restricted to `q(term, boost)`.
    * Emits CTEs q, scored, ranked. `docPred`: extra SQL predicate over
    * corpus columns (e.g. lang = 'py'), applied as a semi-join like the
    * reference's fq filter-query intersection (LireRequestHandler.java:555).
    */
  def bm25Ctes(terms: Seq[(String, Double)], docPred: Option[String] = None): String = {
    val filterJoin = docPred match {
      case Some(p) => s"\n  AND p.doc_id IN (SELECT doc_id FROM corpus WHERE $p)"
      case None => ""
    }
    s"""q(term, boost) AS (SELECT * FROM (VALUES ${termValues(terms)}) v(term, boost)),
       |scored AS (
       |  SELECT p.doc_id,
       |         sum(q.boost * ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
       |             * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
       |  FROM post p
       |  JOIN q ON p.term = q.term
       |  JOIN dict f ON f.term = p.term
       |  JOIN dl d ON d.doc_id = p.doc_id
       |  CROSS JOIN stats s
       |  WHERE 1 = 1$filterJoin
       |  GROUP BY 1),
       |ranked AS (
       |  SELECT doc_id,
       |         CAST(round(score * 1000000.0) AS BIGINT) AS score_q,
       |         row_number() OVER (
       |           ORDER BY CAST(round(score * 1000000.0) AS BIGINT) DESC, doc_id ASC) AS rank
       |  FROM scored)""".stripMargin
  }

  /** Full top-k query. */
  def bm25TopK(terms: Seq[(String, Double)], k: Int, docPred: Option[String] = None): String =
    withPrelude(
      s"""     , ${bm25Ctes(terms, docPred)}
         |SELECT rank, doc_id, score_q FROM ranked WHERE rank <= $k ORDER BY rank""".stripMargin)
}
