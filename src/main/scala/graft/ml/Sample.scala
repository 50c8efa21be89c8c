package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data curation: draw
  * ~`target` docs per stratum (language, source, quality bucket) with a
  * content-independent pseudo-random rule that is reproducible across
  * engines, runs, and partitionings — the standard way to rebalance a
  * skewed corpus before training.
  *
  * Rule: a doc survives iff `h < min(2^32, (target·2^32) div n_stratum)`
  * where `h` = first 8 md5 hex chars of `salt:doc_id` read as an integer
  * (uniform on [0, 2^32)). Expected kept ≈ `target` per stratum; strata
  * smaller than `target` keep everything. All arithmetic is exact integer
  * math (no float division anywhere), so the DuckDB oracle
  * ([[graft.sql.OracleMl.stratifiedSampleSql]]) reproduces the survivor
  * set bit-for-bit.
  *
  * Scale shape: one tiny per-stratum count aggregate (rows = #strata)
  * broadcast back onto the corpus; the keep decision is then a per-row
  * codegen'd expression — no shuffle of the corpus itself, no window, no
  * driver loop. At 100 TB the only shuffle is the #strata-row count agg.
  * The threshold form `(target·2^32) div n` (not `h·n < target·2^32`)
  * keeps every intermediate below 2^63 for any stratum size, and `target`
  * up to 2^30 — overflow-free where the product form would wrap at
  * n ≥ 2^31.
  *
  * Null strata: docs whose stratum value is NULL are DROPPED, not
  * sampled — the stratum equi-join has a null key (never matches), and
  * the DuckDB oracle mirrors the same inner join. Callers that want a
  * null stratum sampled must coalesce the column to a sentinel value
  * first (part of the keep-rule contract; ADVICE r04).
  */
object Sample {

  /** Survivors as (doc_id, stratum, samp_hash), `strataCol` renamed to
    * `stratum`. `target`: expected survivors per stratum (≤ 2^30).
    */
  def stratified(corpus: DataFrame, strataCol: String, target: Long,
                 salt: String = "samp"): DataFrame = {
    require(target > 0 && target <= (1L << 30), s"target out of range: $target")
    val counts = corpus.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_stratum"))
    val h = conv(substring(md5(concat(lit(salt + ":"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    corpus.select(col("doc_id"), col(strataCol).as("stratum"))
      .join(broadcast(counts), "stratum")
      .withColumn("samp_hash", h)
      .where(col("samp_hash") <
        least(lit(1L << 32), expr(s"${target * (1L << 32)}L div n_stratum")))
      .select(col("doc_id"), col("stratum"), col("samp_hash"))
  }
}
