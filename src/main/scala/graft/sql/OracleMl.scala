package graft.sql

import graft.ml.{Ann, Dedup, TextStats}

/** DuckDB oracle SQL for the training-pipeline operators (dedup / ANN /
  * text stats / multimodal metadata). Constants (minhash fn count, LSH
  * planes, profiles, regexes) are read from the SAME Scala objects the
  * engine uses — one source of truth.
  */
object OracleMl {
  import Oracle.withPrelude

  /** corpus + injected dups (mirror of Dedup.withDups). */
  val dupCtes: String =
    """corpus2 AS (
      |  SELECT doc_id, content FROM corpus
      |  UNION ALL
      |  SELECT doc_id + 1000000, content FROM corpus WHERE doc_id % 97 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, content || ' spark' FROM corpus WHERE doc_id % 101 = 0)""".stripMargin

  /** Distinct bigram shingles of `src`(doc_id, content): sh2(doc_id, sh). */
  def shingleCtesOver(src: String): String =
    s"""toks2 AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS ts
       |  FROM $src),
       |sh2 AS (
       |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] AS sh
       |  FROM toks2, unnest(generate_series(1, len(ts) - 1)) AS g(i))""".stripMargin

  val shingleCtes: String = shingleCtesOver("corpus2")

  /** Mirror of [[graft.ml.Dedup.spanDups]]: positioned width-token window
    * md5s, boilerplate cap (2 ≤ occurrences ≤ maxOcc), cross-doc matches,
    * maximal runs via gaps-and-islands (pa − row_number over the diagonal
    * is constant per consecutive run).
    */
  def spanDupsSql(width: Int, maxOcc: Int): String = withPrelude(
    s"""     , wtoks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS ts
       |  FROM corpus),
       |wins AS (
       |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+${width - 1}], ' ')) AS whash
       |  FROM wtoks, unnest(generate_series(1, len(ts) - ${width - 1})) AS g(i)),
       |keep AS (SELECT whash FROM wins GROUP BY whash HAVING count(*) BETWEEN 2 AND $maxOcc),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
       |  FROM wins a JOIN keep USING (whash) JOIN wins b USING (whash)
       |  WHERE a.doc_id < b.doc_id),
       |r AS (
       |  SELECT doc_a, doc_b, pa - pb AS diag, pa,
       |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
       |  FROM p)
       |SELECT doc_a, doc_b,
       |       min(pa)::BIGINT AS start_a, (min(pa) - diag)::BIGINT AS start_b,
       |       count(*)::BIGINT AS n_windows, (count(*) + ${width - 1})::BIGINT AS span_tokens
       |FROM r GROUP BY doc_a, doc_b, diag, grp""".stripMargin)

  def exactDupsSql: String = withPrelude(
    s"""     , $dupCtes
       |SELECT md5(content) AS content_hash, count(*)::BIGINT AS n_dups,
       |       min(doc_id) AS keep_doc_id
       |FROM corpus2 GROUP BY 1 HAVING count(*) > 1""".stripMargin)

  /** Minhash signature + band CTEs -> bands(doc_id, band_j, band_hash). */
  def minhashCtes: String = {
    val mhCols = (0 until Dedup.MinhashFns)
      .map(i => s"min(md5('$i:' || sh)) AS mh$i").mkString(",\n         ")
    val rpb = Dedup.MinhashFns / Dedup.MinhashBands
    val bandRows = (0 until Dedup.MinhashBands).map { j =>
      val parts = (0 until rpb).map(r => s"mh${j * rpb + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $j AS band_j, md5($parts) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""sig AS (
       |  SELECT doc_id,
       |         $mhCols
       |  FROM sh2 GROUP BY doc_id),
       |bands AS (
       |  $bandRows)""".stripMargin
  }

  def minhashPairsSql: String = withPrelude(
    s"""     , $dupCtes,
       |$shingleCtes,
       |$minhashCtes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared_bands
       |FROM bands a
       |JOIN bands b ON a.band_j = b.band_j AND a.band_hash = b.band_hash
       |            AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin)

  /** Graph chain over bands(doc_id, band_j, band_hash): candidate pairs ->
    * undirected edges -> recursive min-label walk -> cc(doc_id,
    * cluster_id). Needs the WITH RECURSIVE prefix, so callers compose
    * manually (not via withPrelude).
    */
  private def ccGraphCtes: String =
    s"""pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a
       |  JOIN bands b ON a.band_j = b.band_j AND a.band_hash = b.band_hash
       |              AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |walk(node, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
       |cc AS (
       |  SELECT node AS doc_id, min(label)::BIGINT AS cluster_id
       |  FROM walk GROUP BY node)""".stripMargin

  private def ccCtes: String =
    s"""$dupCtes,
       |$shingleCtes,
       |$minhashCtes,
       |$ccGraphCtes""".stripMargin

  /** End-to-end curation pipeline (mirror of Curation.curate): quality
    * gate over the dup-injected corpus, then near-dup clustering among
    * the SURVIVORS only — stage order is part of the contract.
    */
  def curationSql: String = {
    val t = graft.ml.Curation.QualityThreshold
    s"""WITH RECURSIVE ${Oracle.prelude},
       |$dupCtes,
       |toksc AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS ts
       |  FROM corpus2),
       |${qualityCtesOver("corpus2", "toksc")},
       |qual AS (
       |  SELECT doc_id,
       |         CAST(round($qualityExpr * 1000000.0) AS BIGINT) AS quality_q
       |  FROM ratios),
       |surv AS (
       |  SELECT c2.doc_id, c2.content
       |  FROM corpus2 c2 JOIN qual q ON q.doc_id = c2.doc_id
       |  WHERE q.quality_q >= $t),
       |${shingleCtesOver("surv")},
       |$minhashCtes,
       |$ccGraphCtes
       |SELECT c2.doc_id, q.quality_q,
       |       (CASE WHEN q.quality_q >= $t THEN 1 ELSE 0 END)::BIGINT AS passed_quality,
       |       coalesce(cc.cluster_id, c2.doc_id)::BIGINT AS cluster_id,
       |       (CASE WHEN q.quality_q >= $t
       |             AND coalesce(cc.cluster_id, c2.doc_id) = c2.doc_id
       |             THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM corpus2 c2
       |JOIN qual q ON q.doc_id = c2.doc_id
       |LEFT JOIN cc ON cc.doc_id = c2.doc_id""".stripMargin
  }

  /** Connected components of the minhash candidate-pair graph. */
  def dedupClustersSql: String =
    s"""WITH RECURSIVE ${Oracle.prelude},
       |$ccCtes
       |SELECT doc_id, cluster_id FROM cc""".stripMargin

  /** Full per-doc dedup decision table (cluster + keep flag). */
  def dedupDecisionsSql: String =
    s"""WITH RECURSIVE ${Oracle.prelude},
       |$ccCtes
       |SELECT c2.doc_id,
       |       coalesce(cc.cluster_id, c2.doc_id)::BIGINT AS cluster_id,
       |       (CASE WHEN coalesce(cc.cluster_id, c2.doc_id) = c2.doc_id
       |             THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM corpus2 c2 LEFT JOIN cc ON cc.doc_id = c2.doc_id""".stripMargin

  def jaccardPairsSql: String = withPrelude(
    s"""     , $dupCtes,
       |$shingleCtes,
       |$minhashCtes,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a
       |  JOIN bands b ON a.band_j = b.band_j AND a.band_hash = b.band_hash
       |              AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh2 GROUP BY 1),
       |inter AS (
       |  SELECT p.doc_a, p.doc_b, count(*)::BIGINT AS i
       |  FROM pairs p
       |  JOIN sh2 a ON a.doc_id = p.doc_a
       |  JOIN sh2 b ON b.doc_id = p.doc_b AND b.sh = a.sh
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b,
       |       CAST(round(1000000.0 * i.i / (sa.n + sb.n - i.i)) AS BIGINT) AS jaccard_q
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.doc_a
       |JOIN sizes sb ON sb.doc_id = i.doc_b""".stripMargin)

  /** simhash CTE over post0(doc_id, term, tf) -> sim(doc_id, simhash).
    * post0 (RAW tf, no MaxTf clamp) because Dedup.simhash weighs by the
    * actual per-doc term counts. Bit 63's weight is rendered as (-MAX-1):
    * summed LAST so every partial sum stays in BIGINT range, and the final
    * two's-complement value equals Spark's `sh |= 1L << 63` bit pattern
    * exactly.
    */
  def simhashCte: String = {
    val sums = (0 until Dedup.SimhashBits).map(b =>
      s"sum(CASE WHEN substr(md5(term || ':$b'), 1, 1) < '8' THEN tf ELSE -tf END) AS s$b")
      .mkString(",\n         ")
    def bitLit(b: Int): String =
      if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
    val combine = (0 until Dedup.SimhashBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${bitLit(b)} ELSE 0 END)").mkString(" + ")
    s"""simsum AS (
       |  SELECT doc_id,
       |         $sums
       |  FROM post0 GROUP BY doc_id),
       |sim AS (SELECT doc_id, CAST($combine AS BIGINT) AS simhash FROM simsum)""".stripMargin
  }

  def simhashSql: String = withPrelude(
    s"""     , $simhashCte
       |SELECT doc_id, simhash FROM sim""".stripMargin)

  def simhashPairsSql(maxHamming: Int): String = withPrelude(
    s"""     , $simhashCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin)

  /** double-precision cosine between two DOUBLE[] expressions. */
  private def cosSql(a: String, b: String): String =
    s"""(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) /
       | (sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) *
       |  sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))))""".stripMargin

  /** L1 distance — list_sum(list_transform(...)) sums sequentially, so the
    * doubles are bit-identical to GraftL1's left-to-right loop (verified
    * exact over 3000 embedding pairs before quantization).
    */
  private def l1Sql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)),
       |  i -> abs($a[i]::DOUBLE - $b[i]::DOUBLE)))""".stripMargin

  /** L2 distance — explicit multiply (not ^2/pow) so the per-element square
    * is the same single-rounded d*d as GraftL2's loop; greatest(..,0)
    * mirrors the native clamp before sqrt.
    */
  private def l2Sql(a: String, b: String): String =
    s"""sqrt(greatest(list_sum(list_transform(generate_series(1, len($a)),
       |  i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), 0))""".stripMargin

  /** LIRE Tanimoto distance — mirror of GraftDot.tanimoto (decompiled
    * MetricsUtils semantics): per-element ops and the final expression
    * tree in LIRE's exact order; `sa`/`sb` are the precomputed element
    * sums (rerankSql's emb/qv CTEs carry them). NULL inputs (the missing-
    * feature LEFT JOIN row) must yield NULL — a bare CASE would fall
    * through NULL conditions to the ELSE 0 arm and rank the missing doc
    * FIRST instead of last.
    */
  private def tanimotoSql(a: String, b: String, sa: String, sb: String): String = {
    val t1 = s"""list_sum(list_transform(generate_series(1, len($a)),
                |    i -> ($a[i]::DOUBLE / $sa) * ($b[i]::DOUBLE / $sb)))""".stripMargin
    val t2 = s"""list_sum(list_transform(generate_series(1, len($b)),
                |    i -> ($b[i]::DOUBLE / $sb) * ($b[i]::DOUBLE / $sb)))""".stripMargin
    val t3 = s"""list_sum(list_transform(generate_series(1, len($a)),
                |    i -> ($a[i]::DOUBLE / $sa) * ($a[i]::DOUBLE / $sa)))""".stripMargin
    s"""(CASE WHEN $a IS NULL OR $b IS NULL THEN NULL
       |      WHEN $sa = 0 AND $sb = 0 THEN 0.0
       |      WHEN $sa = 0 OR $sb = 0 THEN 100.0
       |      WHEN $sa > 0 AND $sb > 0
       |        THEN 100.0 - 100.0 * ($t1 / ($t2 + $t3 - $t1))
       |      ELSE 0.0 END)""".stripMargin
  }

  def embCosPairsSql(minCosQ: Long): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         CAST(round(${cosSql("a.embedding", "b.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos_q FROM p WHERE cos_q >= $minCosQ""".stripMargin

  /** Bucketed (sign-LSH) embedding near-dup pairs — mirror of
    * Dedup.embCosBucketedPairs: candidates restricted to equal buckets.
    * `bits` must match the Spark side's bucket width (the candidate set —
    * and so the output — depends on it).
    */
  def embCosBucketedSql(minCosQ: Long, bits: Int = Ann.LshBits): String =
    s"""WITH wb AS (
       |  SELECT vec_id, embedding, CAST(${lshBucketSql("embedding", bits)} AS BIGINT) AS bucket
       |  FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         CAST(round(${cosSql("a.embedding", "b.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos_q FROM p WHERE cos_q >= $minCosQ""".stripMargin

  /** Two-phase retrieve-then-re-rank: BM25 top-`candidates` -> exact
    * cosine to `queryVecId`'s embedding -> top-`rows` (mirror of
    * Engine.searchRerank). LEFT join + sentinel: a candidate with no
    * embedding row keeps its slot with cos_q = -10001 — the reference's
    * missing-value → maxDistance rule (LireValueSource.java:274-276;
    * Engine.MissingFeatureCosQ). `embPred` restricts the embedding
    * side-store (the missing-embedding gate's corpus shaping).
    */
  def rerankSql(terms: Seq[(String, Double)], queryVecId: Long,
                candidates: Int, rows: Int,
                embPred: Option[String] = None,
                metric: String = "cosine"): String = {
    val embWhere = embPred.map(p => s" WHERE $p").getOrElse("")
    // cosine is a similarity (DESC, sentinel below every real value);
    // l1/l2 are distances (ASC, sentinel above — Engine.MissingFeatureDistQ)
    val (distExpr, qCol, ord, sentinel) = metric match {
      case "cosine" => (cosSql("qv.q_emb", "e.embedding"), "cos_q", "DESC", "-10001")
      case "l1" => (l1Sql("qv.q_emb", "e.embedding"), "dist_q", "ASC", "10000000001")
      case "l2" => (l2Sql("qv.q_emb", "e.embedding"), "dist_q", "ASC", "10000000001")
      case "tanimoto" => (tanimotoSql("qv.q_emb", "e.embedding", "qv.s_q", "e.s_e"),
        "dist_q", "ASC", "10000000001")
      case other => throw new IllegalArgumentException(s"metric $other")
    }
    withPrelude(
      s"""     , ${Oracle.qFromValues(terms)},
         |${Oracle.bm25Body(None)},
         |cand AS (SELECT doc_id, score_q FROM ranked WHERE rank <= $candidates),
         |emb AS (SELECT vec_id, embedding,
         |        list_sum(embedding::DOUBLE[]) AS s_e FROM embeddings$embWhere),
         |qv AS (SELECT embedding AS q_emb, s_e AS s_q FROM emb WHERE vec_id = $queryVecId),
         |rer AS (
         |  SELECT c.doc_id, c.score_q,
         |         coalesce(
         |           CAST(round($distExpr * 10000.0) AS BIGINT),
         |           $sentinel) AS $qCol
         |  FROM cand c LEFT JOIN emb e ON e.vec_id = c.doc_id CROSS JOIN qv),
         |rr AS (
         |  SELECT row_number() OVER (ORDER BY $qCol $ord, doc_id ASC) AS rank,
         |         doc_id, $qCol, score_q
         |  FROM rer)
         |SELECT rank, doc_id, $qCol, score_q FROM rr WHERE rank <= $rows ORDER BY rank""".stripMargin)
  }

  /** Multi-probe LSH ANN (mirror of Ann.lshTopKMultiProbe): each query
    * probes its bucket plus every Hamming-1 neighbor.
    */
  def annMultiProbeSql(queryIds: Seq[Long], k: Int): String = {
    val masks = Ann.MultiProbeMasks.map(m => s"($m)").mkString(", ")
    s"""WITH wb AS (
       |  SELECT vec_id, embedding, CAST(${lshBucketSql("embedding")} AS BIGINT) AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, xor(bucket, p.m) AS bucket
       |      FROM wb, (VALUES $masks) p(m)
       |      WHERE vec_id IN (${queryIds.mkString(", ")})),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |         CAST(round(${cosSql("q.q_emb", "e.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM wb e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_q,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_q DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_q FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** MetricSpaces reference-point encoding (mirror of Ann.metricSpacesTerms). */
  def metricSpacesSql(r: Int, k: Int): String =
    s"""WITH refs AS (
       |  SELECT vec_id AS ref_id, embedding AS ref_emb FROM embeddings
       |  ORDER BY vec_id LIMIT $r),
       |d AS (
       |  SELECT e.vec_id, refs.ref_id,
       |         CAST(round(${cosSql("e.embedding", "refs.ref_emb")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM embeddings e CROSS JOIN refs),
       |rk AS (
       |  SELECT vec_id, ref_id, cos_q,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, ref_id ASC) AS ref_rank
       |  FROM d)
       |SELECT vec_id, ref_rank, 'r:' || ref_id AS term,
       |       CAST(round(($k - ref_rank + 1) * 1000000.0 / $k) AS BIGINT) AS boost_q
       |FROM rk WHERE ref_rank <= $k""".stripMargin

  /** IVF ANN over metric-space cells (mirror of Ann.ivfTopK). */
  def annIvfSql(queryIds: Seq[Long], k: Int, r: Int, probes: Int): String =
    s"""WITH refs AS (
       |  SELECT vec_id AS ref_id, embedding AS ref_emb FROM embeddings
       |  ORDER BY vec_id LIMIT $r),
       |d AS (
       |  SELECT e.vec_id, e.embedding, refs.ref_id,
       |         CAST(round(${cosSql("e.embedding", "refs.ref_emb")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM embeddings e CROSS JOIN refs),
       |rk AS (
       |  SELECT vec_id, embedding, ref_id, cos_q,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, ref_id ASC) AS rnk
       |  FROM d),
       |cells AS (SELECT vec_id, embedding, ref_id AS cell FROM rk WHERE rnk = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, ref_id AS cell
       |      FROM rk WHERE vec_id IN (${queryIds.mkString(", ")}) AND rnk <= $probes),
       |scored AS (
       |  SELECT q.query_id, c.vec_id,
       |         CAST(round(${cosSql("q.q_emb", "c.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM cells c JOIN q ON c.cell = q.cell WHERE c.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_q,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_q DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_q FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** lirefunc full-scan exact sort (mirror of Ann.fullSort). */
  def annFullSortSql(queryVecId: Long): String =
    s"""WITH qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = $queryVecId),
       |scored AS (
       |  SELECT e.vec_id,
       |         CAST(round(${cosSql("qv.q_emb", "e.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM embeddings e CROSS JOIN qv)
       |SELECT row_number() OVER (ORDER BY cos_q DESC, vec_id ASC) AS rank, vec_id, cos_q
       |FROM scored ORDER BY rank""".stripMargin

  def annBruteSql(queryIds: Seq[Long], k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
       |           WHERE vec_id IN (${queryIds.mkString(", ")})),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |         CAST(round(${cosSql("q.q_emb", "e.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_q,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_q DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_q FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** bucket expression serializing Ann's LSH planes into SQL. */
  def lshBucketSql(embExpr: String, bits: Int = Ann.LshBits): String =
    (0 until bits).map { j =>
      val arr = Ann.lshPlane(j).mkString("[", ", ", "]")
      s"(CASE WHEN round(list_dot_product($embExpr::DOUBLE[], $arr::DOUBLE[]) * 1e9) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** How many plane terms the dynamic-bits oracle bucket renders. Covers
    * any gate corpus by orders of magnitude (2^16 buckets needs 64M rows
    * at target 1000); the Scala rule itself clamps at 62 for scale.
    */
  val DerivedBitsSqlMax = 16

  /** Ann.lshBitsFor as SQL: smallest b with ⌈n/target⌉ ≤ 2^b, clamped to
    * [1, DerivedBitsSqlMax] — a CASE chain over exact power-of-two integer
    * comparisons generated from the SAME rule as the Scala side, so no
    * floating log2 can disagree at a boundary. `qqExpr` = ⌈n/target⌉.
    */
  def lshBitsCase(qqExpr: String): String = {
    val whens = (1 to DerivedBitsSqlMax)
      .map(b => s"WHEN ($qqExpr) <= ${1L << b} THEN $b").mkString(" ")
    s"(CASE $whens ELSE $DerivedBitsSqlMax END)"
  }

  /** Dynamic-width sign-LSH bucket: plane j contributes iff j < `bitsCol`
    * — valid because Ann's planes are prefix-stable (plane j depends only
    * on j), so the first `bits` terms ARE the `bits`-wide bucketing.
    */
  def lshBucketDynSql(embExpr: String, bitsCol: String): String =
    (0 until DerivedBitsSqlMax).map { j =>
      val arr = Ann.lshPlane(j).mkString("[", ", ", "]")
      s"(CASE WHEN $j < $bitsCol AND round(list_dot_product($embExpr::DOUBLE[], $arr::DOUBLE[]) * 1e9) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Mirror of Dedup.embCosBucketedPairsDerived: bucket width derived from
    * count(*) by the integer-exact [[lshBitsSql]] rule.
    */
  def embCosBucketedDerivedSql(minCosQ: Long, target: Long): String =
    s"""WITH bitsv AS (
       |  SELECT ${lshBitsCase("qq")} AS bits
       |  FROM (SELECT (greatest(count(*), 1) - 1) // $target + 1 AS qq FROM embeddings)),
       |wb AS (
       |  SELECT vec_id, embedding,
       |         CAST(${lshBucketDynSql("embedding", "bitsv.bits")} AS BIGINT) AS bucket
       |  FROM embeddings CROSS JOIN bitsv),
       |p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         CAST(round(${cosSql("a.embedding", "b.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos_q FROM p WHERE cos_q >= $minCosQ""".stripMargin

  /** Mirror of Dedup.contamination: corpus docs sharing any `width`-token
    * shingle (joined on md5) with the benchmark table. `benchPred` selects
    * the benchmark rows out of the base corpus.
    */
  def contaminationSql(benchPred: String, width: Int): String = {
    def gram(ts: String, i: String): String =
      (0 until width).map(k => s"$ts[$i + $k]").mkString(" || ' ' || ")
    withPrelude(
      s"""     , $dupCtes,
         |benchdocs AS (
         |  SELECT doc_id AS bench_id, content FROM corpus WHERE $benchPred),
         |tokc AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS ts
         |  FROM corpus2),
         |shc AS (
         |  SELECT DISTINCT doc_id, md5(${gram("ts", "i")}) AS shh
         |  FROM tokc, unnest(generate_series(1, len(ts) - ${width - 1})) AS g(i)),
         |tokb AS (
         |  SELECT bench_id,
         |         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS ts
         |  FROM benchdocs),
         |shb AS (
         |  SELECT DISTINCT bench_id, md5(${gram("ts", "i")}) AS shh
         |  FROM tokb, unnest(generate_series(1, len(ts) - ${width - 1})) AS g(i))
         |SELECT c.doc_id,
         |       count(DISTINCT b.bench_id)::BIGINT AS n_bench_docs,
         |       count(DISTINCT c.shh)::BIGINT AS n_shingles
         |FROM shc c JOIN shb b ON b.shh = c.shh
         |GROUP BY 1""".stripMargin)
  }

  def annLshSql(queryIds: Seq[Long], k: Int): String =
    s"""WITH wb AS (
       |  SELECT vec_id, embedding, CAST(${lshBucketSql("embedding")} AS BIGINT) AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM wb
       |      WHERE vec_id IN (${queryIds.mkString(", ")})),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, e.bucket,
       |         CAST(round(${cosSql("q.q_emb", "e.embedding")} * 10000.0) AS BIGINT) AS cos_q
       |  FROM wb e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, bucket, cos_q,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_q DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cos_q, bucket FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Top-N class-weight cutoff (mirror of Features.topNFeatures). */
  def topNFeaturesSql(n: Int, sigFrac: Double): String =
    s"""WITH exploded AS (
       |  SELECT vec_id, (i - 1)::BIGINT AS dim, embedding[i]::DOUBLE AS w
       |  FROM embeddings, unnest(generate_series(1, len(embedding))) g(i)),
       |ranked AS (
       |  SELECT vec_id, dim, w,
       |         max(w) OVER (PARTITION BY vec_id) AS max_w,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY w DESC, dim ASC) AS rank
       |  FROM exploded)
       |SELECT vec_id, rank, dim,
       |       CAST(round(w * 1000000.0) AS BIGINT) AS w_q,
       |       'd:' || lpad(dim::VARCHAR, 3, '0') AS term
       |FROM ranked
       |WHERE rank <= $n AND w > 0 AND w >= max_w * $sigFrac""".stripMargin

  /** Per-row min-max normalization (mirror of Features.minMaxNormalize). */
  def minMaxSql: String =
    s"""WITH exploded AS (
       |  SELECT vec_id, (i - 1)::BIGINT AS dim, embedding[i]::DOUBLE AS w
       |  FROM embeddings, unnest(generate_series(1, len(embedding))) g(i)),
       |r AS (
       |  SELECT vec_id, dim, w,
       |         min(w) OVER (PARTITION BY vec_id) AS min_w,
       |         max(w) OVER (PARTITION BY vec_id) AS max_w
       |  FROM exploded)
       |SELECT vec_id, dim,
       |       CAST(CASE WHEN max_w > min_w
       |                 THEN round((w - min_w) / (max_w - min_w) * 1000000.0)
       |                 ELSE 0.0 END AS BIGINT) AS norm_q
       |FROM r""".stripMargin

  /** Symmetric int8 quantization (mirror of Features.quantizeInt8). */
  def quantizeInt8Sql: String =
    s"""WITH exploded AS (
       |  SELECT vec_id, (i - 1)::BIGINT AS dim, embedding[i]::DOUBLE AS w
       |  FROM embeddings, unnest(generate_series(1, len(embedding))) g(i)),
       |r AS (
       |  SELECT vec_id, dim, w, max(abs(w)) OVER (PARTITION BY vec_id) AS maxabs
       |  FROM exploded)
       |SELECT vec_id, dim,
       |       CAST(CASE WHEN maxabs > 0 THEN round(w * 127.0 / maxabs)
       |                 ELSE 0.0 END AS BIGINT) AS q8,
       |       CAST(round(maxabs * 1000000.0) AS BIGINT) AS scale_q
       |FROM r""".stripMargin

  // ---- text stats -------------------------------------------------------

  def langIdSql: String = {
    // left-to-right fold, first profile wins ties (profiles name-sorted)
    val hitExprs = TextStats.LangProfiles.map { case (name, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      name -> s"len(list_filter(ts, x -> x IN ($list)))"
    }
    val bestHits = hitExprs.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    val predChain = hitExprs.reverse.foldLeft("'und'") { case (acc, (name, e)) =>
      s"CASE WHEN $e >= $bestHits AND $e > 0 THEN '$name' ELSE $acc END"
    } // reversed fold => earliest profile tested last wraps outermost...
    withPrelude(
      s"""SELECT doc_id, $predChain AS pred_lang, CAST($bestHits AS BIGINT) AS best_hits
         |FROM toks""".stripMargin)
  }

  /** Quality feature chain over `src`(doc_id, content) and `toksSrc`
    * (doc_id, ts) — ONE definition of the composite, shared by qualitySql
    * and curationSql (a weight/stops change edits exactly one place plus
    * TextStats.quality). Emits feats -> ratios(doc_id, n_chars, n_toks,
    * punct_ratio, stop_ratio, mean_tok_len).
    */
  def qualityCtesOver(src: String, toksSrc: String): String = {
    val stops = TextStats.QualityStops.map(w => s"'$w'").mkString(", ")
    s"""feats AS (
       |  SELECT c.doc_id,
       |         length(c.content)::DOUBLE AS n_chars,
       |         len(t.ts)::DOUBLE AS n_toks,
       |         (length(c.content) - length(regexp_replace(c.content, '${TextStats.PunctRe}', '', 'g')))::DOUBLE AS n_punct,
       |         len(list_filter(t.ts, x -> x IN ($stops)))::DOUBLE AS n_stop,
       |         coalesce(list_sum(list_transform(t.ts, x -> length(x))), 0)::DOUBLE AS tok_chars
       |  FROM $src c JOIN $toksSrc t ON t.doc_id = c.doc_id),
       |ratios AS (
       |  SELECT doc_id, n_chars, n_toks,
       |         CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END AS punct_ratio,
       |         CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0 END AS stop_ratio,
       |         CASE WHEN n_toks > 0 THEN tok_chars / n_toks ELSE 0 END AS mean_tok_len
       |  FROM feats)""".stripMargin
  }

  /** The composite as a SQL expression over a `ratios` row. */
  val qualityExpr: String =
    """(0.5 * least(1.0, n_toks / 40.0) + 0.3 * (1.0 - punct_ratio)
      |             + 0.2 * least(1.0, 10.0 * stop_ratio))""".stripMargin

  def qualitySql: String =
    withPrelude(
      s"""     , ${qualityCtesOver("corpus", "toks")}
         |SELECT doc_id,
         |       CAST(n_chars AS BIGINT) AS n_chars,
         |       CAST(n_toks AS BIGINT) AS n_tokens,
         |       CAST(round(punct_ratio * 1000000.0) AS BIGINT) AS punct_q,
         |       CAST(round(stop_ratio * 1000000.0) AS BIGINT) AS stop_q,
         |       CAST(round(mean_tok_len * 1000000.0) AS BIGINT) AS mean_tok_len_q,
         |       CAST(round($qualityExpr * 1000000.0) AS BIGINT) AS quality_q
         |FROM ratios""".stripMargin)

  def tokenCountsSql: String = withPrelude(
    s"""SELECT doc_id,
       |       len(list_filter(regexp_split_to_array(content, '${TextStats.WsClass}+'), x -> x <> ''))::BIGINT AS ws_tokens,
       |       len(regexp_extract_all(lower(content), '${TextStats.BpeRe}'))::BIGINT AS bpe_tokens,
       |       length(content)::BIGINT AS n_chars
       |FROM corpus""".stripMargin)

  def fingerprintSql: String = withPrelude(
    s"""     , fp AS (
       |  SELECT doc_id, min(md5(substr(content, i, 8))) AS fp
       |  FROM corpus, unnest(generate_series(1, length(content) - 7)) g(i)
       |  WHERE length(content) >= 8
       |  GROUP BY doc_id)
       |SELECT c.doc_id, fp.fp FROM corpus c LEFT JOIN fp ON fp.doc_id = c.doc_id""".stripMargin)

  /** Frame sampling (mirror of Binary.frameSample). */
  def frameSampleSql(width: Int, stride: Int): String = {
    val step = width * stride
    withPrelude(
      s"""SELECT doc_id, j::BIGINT AS frame_idx,
         |       sha256(substr(content, j * $step + 1, $width)) AS frame_sha
         |FROM corpus,
         |     unnest(generate_series(0,
         |       CAST(floor((length(content) - $width) / $step) AS BIGINT))) g(j)
         |WHERE length(content) >= $width""".stripMargin)
  }

  def binaryMetaSql: String = withPrelude(
    s"""SELECT doc_id,
       |       octet_length(content::BLOB)::BIGINT AS byte_len,
       |       sha256(content) AS sha,
       |       lower(hex(substr(content, 1, 8)::BLOB)) AS head_hex
       |FROM corpus""".stripMargin)

  /** Unigram-LM quality score (mirror of TextStats.unigramLogProb): ln
    * once per DISTINCT token, quantized to an integer BEFORE the per-doc
    * sum (the doc aggregate is an exact integer sum — no double-Σ
    * association hazard), same (1e6·ln(c/t)) and (Σ/n) op orders.
    */
  def unigramSql: String = withPrelude(
    s"""     , tk AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
       |cnt AS (SELECT tok, count(*)::BIGINT AS c FROM tk GROUP BY 1),
       |tot AS (SELECT sum(c)::BIGINT AS t FROM cnt),
       |lp AS (
       |  SELECT tok, CAST(round(1000000.0 * ln(c::DOUBLE / t::DOUBLE)) AS BIGINT) AS lp_q
       |  FROM cnt, tot),
       |pd AS (
       |  SELECT tk.doc_id, count(*)::BIGINT AS n_toks, sum(lp.lp_q)::BIGINT AS sum_lp
       |  FROM tk JOIN lp ON lp.tok = tk.tok GROUP BY 1)
       |SELECT c.doc_id,
       |       coalesce(pd.n_toks, 0)::BIGINT AS n_toks,
       |       coalesce(CAST(round(pd.sum_lp::DOUBLE / pd.n_toks::DOUBLE) AS BIGINT), 0)::BIGINT AS mean_lp_q
       |FROM corpus c LEFT JOIN pd ON pd.doc_id = c.doc_id""".stripMargin)

  /** Gopher repetition signals (mirror of TextStats.repetition /
    * GraftRepStats): duplicate-line tallies from per-(doc, line) group
    * counts (n_dup = Σ(c−1), dup chars = Σ(c−1)·len); 2-gram share off
    * the prelude's `toks`. string_split keeps trailing empties and
    * length() counts code points — both matching the expression's
    * split("\n", −1) / codePointCount contract.
    */
  /** `round(1e6·num/den)::BIGINT`, 0 when den = 0 — the single SQL twin of
    * [[graft.ml.TextStats.quantFrac]]. The `1000000.0 * num / den` op
    * order is load-bearing (left-to-right association matches the
    * engine's `(1e6·num)/den`); keep exactly one copy per engine.
    */
  private def fracSql(num: String, den: String): String =
    s"CAST(round(CASE WHEN $den > 0 THEN 1000000.0 * $num / $den ELSE 0 END) AS BIGINT)"

  def repetitionSql: String =
    withPrelude(
      s"""     , lns AS (
         |  SELECT doc_id, unnest(string_split(content, chr(10))) AS ln FROM corpus),
         |lgrp AS (SELECT doc_id, ln, count(*)::BIGINT AS c FROM lns GROUP BY 1, 2),
         |lstats AS (
         |  SELECT doc_id, sum(c)::BIGINT AS n_lines,
         |         sum(c * length(ln))::BIGINT AS line_chars,
         |         sum(c - 1)::BIGINT AS n_dup_lines,
         |         sum((c - 1) * length(ln))::BIGINT AS dup_line_chars
         |  FROM lgrp GROUP BY 1),
         |g2 AS (
         |  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g, count(*)::BIGINT AS c
         |  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS gg(i)
         |  GROUP BY 1, 2),
         |g2c AS (SELECT doc_id, max(c) AS top2, sum(c)::BIGINT AS total2 FROM g2 GROUP BY 1)
         |SELECT l.doc_id, l.n_lines,
         |       ${fracSql("l.n_dup_lines", "l.n_lines")} AS dup_line_q,
         |       ${fracSql("l.dup_line_chars", "l.line_chars")} AS dup_char_q,
         |       ${fracSql("coalesce(g.top2, 0)", "coalesce(g.total2, 0)")} AS top2_q
         |FROM lstats l LEFT JOIN g2c g ON g.doc_id = l.doc_id""".stripMargin)

  /** PII-injected corpus CTE chain (mirror of TextStats.withPii) — ends
    * by redefining `corpus`, for [[Oracle.withCorpusCtes]].
    */
  val piiCtes: String =
    s"""corpus0 AS (
       |${Oracle.corpusBody}),
       |corpus AS (
       |  SELECT doc_id, repo, path, "commit", lang,
       |         CASE WHEN doc_id % 7 = 0 THEN content || ' contact user' || doc_id
       |                   || '@example.com or admin@test' || (doc_id % 10) || '.org'
       |              WHEN doc_id % 11 = 3 THEN content || ' from 10.' || (doc_id % 200)
       |                   || '.0.' || (doc_id % 250)
       |              ELSE content END AS content
       |  FROM corpus0)""".stripMargin

  /** PII redaction (mirror of TextStats.redactPii over withPii): counts
    * + sha256 attestation of the redacted text. regexp_replace needs the
    * explicit 'g' flag — DuckDB replaces first-match-only by default
    * where Spark's is global.
    */
  def piiSql: String = {
    val email = TextStats.EmailRe
    val ip = TextStats.Ipv4Re
    Oracle.withCorpusCtes(piiCtes,
      s"""SELECT doc_id,
         |       len(regexp_extract_all(lower(content), '$email'))::BIGINT AS n_emails,
         |       len(regexp_extract_all(regexp_replace(lower(content), '$email', '<EMAIL>', 'g'), '$ip'))::BIGINT AS n_ips,
         |       sha256(regexp_replace(regexp_replace(lower(content), '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g')) AS redacted_sha
         |FROM corpus""".stripMargin)
  }

  /** Structure-injected corpus CTE chain (mirror of
    * TextStats.withStructure) — ends by redefining `corpus`, for
    * [[Oracle.withCorpusCtes]]. Fragment strings are built from the same
    * Scala expressions the engine concatenates.
    */
  val structureCtes: String = {
    val syms = " " + Seq.fill(12)("#").mkString(" ")
    val nums = (" " + (0 to 9).mkString(" ")) * 3
    s"""corpus0 AS (
       |${Oracle.corpusBody}),
       |corpus AS (
       |  SELECT doc_id, repo, path, "commit", lang,
       |         content
       |         || CASE WHEN doc_id % 3 = 1 THEN ' and that of have' ELSE '' END
       |         || CASE WHEN doc_id % 10 = 1 THEN chr(10) || '- one' || chr(10) || '- two' ELSE '' END
       |         || CASE WHEN doc_id % 10 = 4 THEN repeat(chr(10) || '- item', 10) ELSE '' END
       |         || CASE WHEN doc_id % 10 = 7 THEN chr(10) || 'wait...' || chr(10) || 'more...' || chr(10) || 'hmm...' ELSE '' END
       |         || CASE WHEN doc_id % 10 = 9 THEN '$syms' ELSE '' END
       |         || CASE WHEN doc_id % 10 = 3 THEN '$nums' ELSE '' END
       |         AS content
       |  FROM corpus0)""".stripMargin
  }

  /** Gopher quality rules (mirror of TextStats.gopherRules over
    * withStructure): same counts, same (1e6·num)/den op order, keep
    * decided on the quantized integers.
    */
  def gopherSql: String = {
    val ws = TextStats.WsClass
    val nws = TextStats.NonWsClass
    val req = TextStats.RequiredWords
      .map(w => s"regexp_matches(content, '(^|$ws)$w($ws|\\z)')::INT")
      .mkString("\n           + ")
    Oracle.withCorpusCtes(structureCtes,
      s"""     , gstats AS (
         |  SELECT doc_id,
         |         len(regexp_extract_all(content, '$nws+'))::BIGINT AS n_words,
         |         length(regexp_replace(content, '$ws', '', 'g'))::BIGINT AS non_space,
         |         (length(content) - length(replace(content, chr(10), '')) + 1)::BIGINT AS n_lines,
         |         (length(content) - length(replace(content, '#', ''))
         |           + len(regexp_extract_all(content, '\\.\\.\\.')))::BIGINT AS n_symbols,
         |         len(regexp_extract_all(content, '(^|\\n)- '))::BIGINT AS n_bullet,
         |         len(regexp_extract_all(content, '\\.\\.\\.(\\n|\\z)'))::BIGINT AS n_ell_end,
         |         len(regexp_extract_all(content, '$nws*[a-z]$nws*'))::BIGINT AS n_alpha,
         |         ($req)::BIGINT AS n_required
         |  FROM corpus),
         |sig AS (
         |  SELECT doc_id, n_words,
         |         ${fracSql("non_space", "n_words")} AS mean_wlen_q,
         |         ${fracSql("n_symbols", "n_words")} AS symbol_q,
         |         ${fracSql("n_bullet", "n_lines")} AS bullet_q,
         |         ${fracSql("n_ell_end", "n_lines")} AS ellipsis_q,
         |         ${fracSql("n_alpha", "n_words")} AS alpha_q,
         |         n_required
         |  FROM gstats)
         |SELECT doc_id, n_words, mean_wlen_q, symbol_q, bullet_q, ellipsis_q,
         |       alpha_q, n_required,
         |       (n_words BETWEEN ${TextStats.GopherMinWords} AND ${TextStats.GopherMaxWords}
         |        AND mean_wlen_q BETWEEN ${TextStats.GopherMinWlenQ} AND ${TextStats.GopherMaxWlenQ}
         |        AND symbol_q <= ${TextStats.GopherMaxSymbolQ}
         |        AND bullet_q <= ${TextStats.GopherMaxBulletQ}
         |        AND ellipsis_q <= ${TextStats.GopherMaxEllipsisQ}
         |        AND alpha_q >= ${TextStats.GopherMinAlphaQ}
         |        AND n_required >= ${TextStats.GopherMinRequired})::BIGINT AS keep
         |FROM sig""".stripMargin)
  }

  /** Stratified sample (mirror of Sample.stratified): same integer-exact
    * keep rule — h < min(2^32, (target·2^32) // n_stratum), h = first 8
    * md5 hex chars of 'salt:doc_id' via the ('0x'||hex)::BIGINT cast.
    */
  def stratifiedSampleSql(strataCol: String, target: Long, salt: String): String =
    withPrelude(
      s"""     , n_s AS (
         |  SELECT $strataCol AS stratum, count(*)::BIGINT AS n_stratum
         |  FROM corpus GROUP BY 1)
         |SELECT c.doc_id, n_s.stratum,
         |       ('0x' || substr(md5('$salt:' || c.doc_id), 1, 8))::BIGINT AS samp_hash
         |FROM corpus c JOIN n_s ON n_s.stratum = c.$strataCol
         |WHERE ('0x' || substr(md5('$salt:' || c.doc_id), 1, 8))::BIGINT <
         |      least(${1L << 32}, ${target * (1L << 32)} // n_stratum)""".stripMargin)
}
