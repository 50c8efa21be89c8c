package graft

import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.query.{Bm25, BruteScorer}

/** Rank-identity of the DataFrame semantic path vs the independent
  * brute-force scorer (SURVEY.md §5.2-2): ranks exact, quantized scores
  * exact, tie-break (score_q desc, doc_id asc).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  lazy val corpus = Corpus.fromDocuments(spark, sfTiny).cache()
  lazy val docs: Seq[(Long, String)] =
    corpus.select($"doc_id", $"content").as[(Long, String)].collect().toSeq

  private def check(terms: Seq[(String, Double)], k: Int): Unit = {
    val got = Bm25.scoreTopK(spark, corpus, terms, k)
      .as[(Long, Long, Long)].collect().toSeq // rank, doc_id, score_q
    val exp = BruteScorer.topK(docs, terms, k)
    assert(got.size == exp.size, "row count")
    got.zip(exp).zipWithIndex.foreach { case (((rank, id, sq), e), i) =>
      assert(rank == i + 1, s"rank at $i")
      assert(id == e.docId, s"docId at rank ${i + 1}: got $id exp ${e.docId}")
      assert(sq == e.scoreQ, s"score_q at rank ${i + 1}")
    }
  }

  test("flagship multi-term query rank-identical to brute scorer") {
    check(SparkEntry.FlagshipTerms, 60)
  }

  test("boosted-term query rank-identical to brute scorer") {
    check(SparkEntry.BoostedTerms, 60)
  }

  test("single rare term / single hot term") {
    check(Seq("w:dup" -> 1.0), 60)
    check(Seq("w:batch" -> 1.0), 25)
  }

  test("query with zero-df terms scores like without them") {
    val got = Bm25.scoreTopK(spark, corpus,
      Seq("w:spark" -> 1.0, "w:nosuchtermxyz" -> 1.0), 10)
      .as[(Long, Long, Long)].collect().toSeq
    val exp = BruteScorer.topK(docs, Seq("w:spark" -> 1.0), 10)
    assert(got.map(_._2) == exp.map(_.docId))
    assert(got.map(_._3) == exp.map(_.scoreQ))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("/export: full match set, top-k prefix == searchByTerms, no single-partition window") {
    import graft.query.Engine
    val engine = Engine.forDir(spark, sfTiny)
    val exported = engine.exportMatches(SparkEntry.ExportTerms)
    val rows = exported.as[(Long, Long, Long)].collect().toSeq
    // every matching doc appears (count == brute match-set size)...
    val expAll = BruteScorer.topK(docs, SparkEntry.ExportTerms, docs.size)
    assert(rows.size == expAll.size, "export must return the FULL match set")
    // ...with the exact ranked output of the brute scorer end to end
    rows.zip(expAll).zipWithIndex.foreach { case (((rank, id, sq), e), i) =>
      assert(rank == i + 1 && id == e.docId && sq == e.scoreQ, s"row $i")
    }
    // the top-60 prefix is exactly searchByTerms' window
    val topk = engine.searchByTerms(SparkEntry.ExportTerms, rows = 60)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.take(60) == topk)
    // plan rule: range-partitioned sort + zipWithIndex, never a global
    // rank window collapsing the match set to one partition. Inspect the
    // PRE-zipWithIndex plan — the RDD hop severs the lineage, so the
    // post-hop plan is an ExternalRDDScan and would pass vacuously
    val sortedPlan = engine.exportScored(SparkEntry.ExportTerms)
      .get.queryExecution.executedPlan.toString
    assert(!sortedPlan.contains("Window"),
      s"export must not use a rank window:\n$sortedPlan")
    assert(sortedPlan.contains("rangepartitioning"),
      s"export sort must range-partition:\n$sortedPlan")
    // zero-df query exports empty, not an error
    assert(engine.exportMatches(Seq("w:zzznosuch" -> 1.0)).count() == 0)
  }

  test("sha invariant: corpus sha matches recomputed sha256") {
    val bad = corpus.where(sha2($"content", 256) =!= $"sha").count()
    assert(bad == 0)
  }
}
