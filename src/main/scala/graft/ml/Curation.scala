package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition the
  * individual operators exist for, as ONE declarative DataFrame program:
  *
  *   stage 1: quality gate (TextStats.quality composite ≥ threshold)
  *   stage 2: near-dup clustering among the SURVIVORS
  *            (minhash → LSH bands → candidate pairs → connected
  *            components → keep component min)
  *   output:  one decision row per input doc.
  *
  * Ordering matters and is part of the contract: dedup runs AFTER the
  * quality filter (industry-standard curation order — low-quality docs
  * must not become cluster survivors), which the DuckDB oracle twin
  * reproduces stage for stage (OracleMl.curationSql).
  *
  * Scale shape: stage 1 is per-row column expressions (no shuffle);
  * stage 2 shuffles only survivor signatures on (band, hash) and the
  * candidate-pair graph — everything inherits the gated operators' plans.
  */
object Curation {

  /** Default quality cut: keeps roughly half the synthetic corpus at
    * every test SF (distribution checked in DuckDB; the gate only needs
    * both engines to agree, but a degenerate all/none split would weaken
    * what it proves).
    */
  val QualityThreshold = 900000L

  /** (doc_id, quality_q, passed_quality, cluster_id, kept) per input doc:
    * kept = passed the quality gate AND is its dedup cluster's survivor
    * (component min; quality-filtered docs are 0 with their own id as
    * cluster_id, singleton survivors are 1).
    */
  /** Optional stage 1.5: benchmark decontamination — docs sharing any
    * 13-gram with the `benchmark` table ([[Dedup.contamination]]) are
    * dropped from the survivor set BEFORE dedup (a contaminated doc must
    * not become a cluster survivor), ending with kept=0 like any other
    * rejected doc. None (the default) keeps the two-stage pipeline
    * byte-identical to its oracle twin.
    */
  def curate(corpus: DataFrame,
             qualityThreshold: Long = QualityThreshold,
             benchmark: Option[DataFrame] = None): DataFrame = {
    // the quality projection feeds three independent subtrees (the
    // survivor semi-join, the decision join, the final output join);
    // persist the tiny (doc_id, quality_q) relation so the corpus is
    // tokenized for quality once, not once per subtree
    val q = TextStats.quality(corpus).select(col("doc_id"), col("quality_q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val surv0 = corpus.join(
      q.where(col("quality_q") >= qualityThreshold), Seq("doc_id"), "left_semi")
    val surv = benchmark match {
      case Some(b) => surv0.join(
        Dedup.contamination(surv0, b).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      case None => surv0
    }
    val pairs = Dedup.minhashPairs(Dedup.minhashBands(Dedup.minhashSignatures(surv)))
    val dec = Dedup.dedupDecisions(surv, pairs)
    val out = corpus.select(col("doc_id"))
      .join(q, Seq("doc_id"))
      .join(dec.select(col("doc_id"), col("cluster_id"), col("keep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_q"),
        (col("quality_q") >= qualityThreshold).cast("long").as("passed_quality"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("keep"), lit(0L)).as("kept"))
    // materialize the (small: one row per doc) decision table eagerly so
    // the quality cache can be released HERE — a long-lived session
    // invoking curate() repeatedly must not accumulate leaked cache blocks
    // (ADVICE r03); localCheckpoint also truncates the three-subtree
    // lineage for downstream consumers. Accepted trade: checkpoint blocks
    // are not fault tolerant (an executor loss after return fails
    // downstream actions instead of recomputing — rerun curate) and are
    // reclaimed by the ContextCleaner when the result goes unreferenced;
    // for a pipeline whose decision table feeds several downstream
    // consumers, one eager materialization is the cheaper side of the
    // trade anyway.
    try out.localCheckpoint() finally q.unpersist(blocking = false)
  }
}
