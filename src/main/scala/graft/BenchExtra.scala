package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, min => fmin, sum => fsum}
import graft.corpus.Corpus
import graft.index.{IndexBuild, IndexConfig}
import graft.ml.{Ann, Dedup}
import graft.query.{Engine, Index}

/** Developer-side measurement harness for the optimization rounds
  * (guide §1.4): times INDIVIDUAL query sections with the exact same
  * setup + action as [[Bench]]'s query phase (staged corpus, same
  * IndexConfig, same engine construction, warm pass + min-of-draws),
  * but skips the ~30-min build-scaling phase so one section iterates in
  * seconds. Optionally dumps `.explain("formatted")` per section.
  *
  * Usage: `sbt "runMain graft.BenchExtra [sections-csv|all] [draws]"`
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench),
  *      GRAFT_EXPLAIN_DIR — write <dir>/<section>.txt formatted plans.
  *
  * NOT part of the driver contract; Bench.scala is the frozen official
  * harness. Numbers printed here are cited in OPTIMIZATION_r06.md as
  * iteration evidence only.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchx-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val want: Set[String] =
      if (args.isEmpty || args(0) == "all") Set.empty
      else args(0).split(",").toSet
    val draws = if (args.length >= 2) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val explainDir = sys.env.get("GRAFT_EXPLAIN_DIR")
    val cfg = IndexConfig(segShift = 9, rangeSegsShift = 7)

    val spark = session(cpus)
    val corpusDir = graft.util.Tmp.dir("graft-benchx-corpus-")
    val nFiles = math.max(2000L,
      spark.read.parquet(s"$sfDir/lineitem.parquet").count())
    Corpus.synthesize(spark, nFiles, seed = 42L, partitions = cpus * 4)
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)

    // lazy engine construction: corpus-only sections never pay the build
    lazy val engine: Engine = {
      val benchIdx = graft.util.Tmp.dir("graft-benchx-q-")
      IndexBuild.build(spark, corpus, benchIdx, cfg)
      val e = new Engine(new Index(spark, benchIdx))
      e.index.stats
      e
    }
    lazy val overCapEngine: Engine = {
      val e = new Engine(new Index(spark, engine.index.indexDir, dictDriverMax = 16L))
      require(e.index.dfViaScan && !e.expandViaDriver)
      e
    }
    lazy val wideEngine: Engine = {
      val wideIdx = graft.util.Tmp.dir("graft-benchx-wideseg-")
      IndexBuild.build(spark,
        corpus.where(col("doc_id") < (1L << 17)),
        wideIdx, IndexConfig(segShift = 23, rangeSegsShift = 1))
      new Engine(new Index(spark, wideIdx))
    }

    val hotRare = Seq("w:license" -> 1.0, "w:apache" -> 1.0, "w:hashimpl" -> 1.0,
      "w:mergefactory" -> 1.0, "w:scanptr" -> 1.0, "w:sortz" -> 1.0)
    val allHot = Seq("w:license" -> 1.0, "w:copyright" -> 1.0, "w:version" -> 1.0)

    lazy val cursor1k: (Long, Long) = {
      val rs = engine.searchByTerms(hotRare, rows = 1000)
        .orderBy(col("rank"))
        .select("score_q", "doc_id").collect()
      if (rs.isEmpty) (Long.MaxValue, Long.MinValue)
      else (rs.last.getLong(0), rs.last.getLong(1))
    }

    // (name, dataframe ctor, action) — action mirrors Bench exactly
    val cnt: DataFrame => Long = _.count()
    val cll: DataFrame => Long = _.collect().length.toLong
    val noop: DataFrame => Long = { df =>
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val sections = Seq[(String, () => DataFrame, DataFrame => Long)](
      ("wand_hot_rare", () => engine.searchByTerms(hotRare, rows = 60), cnt),
      ("wand_pruned", () => engine.searchByTerms(hotRare, rows = 60,
        accuracy = 0.5, candidates = 1000), cnt),
      ("wand_all_hot", () => engine.searchByTerms(allHot, rows = 60), cnt),
      ("all_hot_wideseg_fallback", () =>
        wideEngine.searchByTerms(allHot, rows = 60), cnt),
      ("fuzzy_pruned", () => overCapEngine.searchFuzzy("w:mergefactori",
        maxEdits = 2, rows = 60, maxExpansions = 8), cnt),
      ("wand_filtered", () => engine.searchByTerms(hotRare, rows = 60,
        docFilter = Some(("lang", "py"))), cnt),
      ("wand_filtered_pred", () => engine.searchByTerms(hotRare, rows = 60,
        docPred = Some(col("lang") === "py")), cnt),
      ("content_search", () => engine.searchByContent(
        "license apache hashImpl mergeFactory scanPtr build index term query",
        rows = 60), cnt),
      ("ann_brute", () => Ann.bruteTopK(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), SparkEntry.AnnQueryIds, 10), cnt),
      ("dedup_minhash", () => Dedup.minhashPairs(Dedup.minhashBands(
        Dedup.minhashSignatures(Dedup.withDups(Corpus.fromDocuments(spark, sfDir))))), cnt),
      ("dedup_simhash_banded", () => Dedup.simhashBandedPairs(
        Dedup.simhash(Corpus.fromDocuments(spark, sfDir)), 2), cnt),
      ("dedup_embcos_bucketed", () => Dedup.embCosBucketedPairs(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), 4000L), cnt),
      ("search_rerank", () => Engine.forDir(spark, sfDir).searchRerank(
        SparkEntry.FlagshipTerms, spark.read.parquet(s"$sfDir/embeddings.parquet"),
        SparkEntry.RerankVecId, rows = 60, candidates = 1000), cnt),
      ("fingerprint", () => graft.ml.TextStats.fingerprint(
        Corpus.fromDocuments(spark, sfDir)).agg(fmin("fp")), cll),
      ("facet_lang", () => engine.facet(hotRare, "lang"), cnt),
      ("facet_filtered", () => engine.facet(hotRare, "repo",
        docFilter = Some(("lang", "py"))), cnt),
      ("grouped_repo", () => engine.searchGrouped(hotRare, "repo",
        groupLimit = 3, groups = 10), cnt),
      ("facet_pivot", () => engine.facetPivot(hotRare, "lang", "repo"), cnt),
      ("grouped_filtered", () => engine.searchGrouped(hotRare, "repo",
        groupLimit = 3, groups = 10, docFilter = Some(("lang", "py"))), cnt),
      ("wand_paged_1k", () => engine.searchPage(hotRare, start = 1000, rows = 60), cnt),
      ("wand_cursor_1k", () => engine.searchAfter(hotRare, cursor1k._1, cursor1k._2,
        rows = 60), cnt),
      ("wildcard_leading", () => engine.searchWildcard("*factory", rows = 60,
        maxExpansions = 8), cnt),
      ("wildcard_leading_rdict", () => overCapEngine.searchWildcard("*factory",
        rows = 60, maxExpansions = 8), cnt),
      ("range_search", () => engine.searchRange(Some("w:sa"), Some("w:sp"),
        incLo = true, incHi = false, rows = 60, maxExpansions = 8), cnt),
      ("parsed_mixed", () => engine.searchParsed(corpus,
        "+w:license \"get geter\" w:scanptr^2 -w:stream w:merge*^0.5 w:hach~1",
        rows = 60), cnt),
      ("phrase_exact", () => engine.searchPhrase(corpus, "get geter",
        rows = 60), cnt),
      ("phrase_slop", () => engine.searchPhrase(corpus, "get geter",
        rows = 60, slop = 2), cnt),
      ("gopher_rules", () => graft.ml.TextStats.gopherRules(corpus)
        .agg(fsum("keep"), fmin("mean_wlen_q")), cll),
      ("pii_redact", () => graft.ml.TextStats.redactPii(corpus)
        .agg(fmin("redacted_sha"), fsum("n_emails"), fsum("n_ips")), cll),
      ("repetition", () => graft.ml.TextStats.repetition(corpus)
        .agg(fsum("top2_q"), fsum("dup_line_q")), cll),
      ("stratified_sample", () => graft.ml.Sample.stratified(corpus, "lang", 10000L), cnt),
      ("span_dup", () => Dedup.spanDups(corpus, width = 12, maxOcc = 64), cnt),
      ("block_join", () => engine.blockJoinParents(
        Seq("w:license" -> 1.0, "w:scanptr" -> 2.0), "max", rows = 10), cnt),
      // decomposition probes (guide §1.4 noop isolation), not bench sections
      ("probe_span_wins", () => corpus.select(col("doc_id"),
        org.apache.spark.sql.functions.posexplode(
          graft.functions.GraftFunctions.graft_shingle_hash_pairs(
            col("content"), 12, distinct = false))), noop),
      ("probe_span_keep", () => corpus.select(
          org.apache.spark.sql.functions.explode(
            graft.functions.GraftFunctions.graft_shingle_hash_pairs(
              col("content"), 12, distinct = false)).as("sh"))
        .select(col("sh.h1").as("h1"), col("sh.h2").as("h2"))
        .groupBy(col("h1"), col("h2"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("nocc"))
        .where(col("nocc").between(2, 64))
        .select(col("h1"), col("h2")), noop),
      ("probe_contam_corpus_side", () => corpus.select(col("doc_id"),
        org.apache.spark.sql.functions.explode(
          graft.functions.GraftFunctions.graft_shingle_hash_pairs(
            col("content"), 13, distinct = true))), noop),
      ("unigram_lp", () => graft.ml.TextStats.unigramLogProb(corpus)
        .agg(fsum("mean_lp_q"), fsum("n_toks")), cll),
      ("contamination", () => Dedup.contamination(corpus,
        corpus.where(col("doc_id") % 997 === 0)), cnt))

    // maintenance mode: replicate Bench's compact/upsert draw protocol
    // (fresh untimed copy per draw, min-of-draws) without the build phase
    if (want("maint")) {
      import org.apache.spark.sql.functions.{concat, lit => flit, sha2}
      def copyTree(src: java.io.File, dst: java.io.File): Unit = {
        if (src.isDirectory) {
          dst.mkdirs()
          Option(src.listFiles()).foreach(_.foreach(c =>
            copyTree(c, new java.io.File(dst, c.getName))))
        } else {
          java.nio.file.Files.copy(src.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        }
      }
      def freshCopy(src: String, tag: String): String = {
        val dst = graft.util.Tmp.dir(s"graft-benchx-$tag-")
        copyTree(new java.io.File(src), new java.io.File(dst))
        dst
      }
      val benchIdx = engine.index.indexDir
      val compactDraws = (1 to draws).map { i =>
        val d = freshCopy(benchIdx, s"compact$i")
        val sec = time(IndexBuild.compact(spark, d))
        graft.util.Tmp.rmTree(new java.io.File(d))
        sec
      }
      var lastCompacted = freshCopy(benchIdx, "upsertbase")
      IndexBuild.compact(spark, lastCompacted)
      val upN = math.min(math.max(1000L, nFiles / 100), 65536L)
      val upLift = 1L << 40
      val upBatch = corpus.where(col("doc_id") < upN)
        .withColumn("doc_id", col("doc_id") + upLift)
        .withColumn("content", concat(col("content"), flit(" zzrev2")))
        .withColumn("sha", sha2(col("content"), 256))
      val upsertDraws = (1 to draws).map { i =>
        val d = freshCopy(lastCompacted, s"upsert$i")
        val uSec = time(IndexBuild.upsert(spark, upBatch, d, cfg, Seq("path")))
        val rSec = time(IndexBuild.compact(spark, d))
        graft.util.Tmp.rmTree(new java.io.File(d))
        (uSec, rSec)
      }
      println(s"""{"benchx_maint":{"compact":${compactDraws.min},""" +
        s""""compact_draws":${compactDraws.mkString("[", ",", "]")},""" +
        s""""upsert":${upsertDraws.map(_._1).min},""" +
        s""""reclaim":${upsertDraws.map(_._2).min},""" +
        s""""reclaim_draws":${upsertDraws.map(_._2).mkString("[", ",", "]")}}}""")
      Console.out.flush()
      spark.stop()
      return
    }
    val chosen = sections.filter(s => want.isEmpty || want(s._1))
    require(chosen.nonEmpty, s"no section matches ${args.headOption}")

    explainDir.foreach { d =>
      Files.createDirectories(Paths.get(d))
      chosen.foreach { case (name, mk, _) =>
        val txt = mk().queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(d, s"$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        ()
      }
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Array[Double]]()
    chosen.foreach { case (name, mk, act) => act(mk()); results(name) = new Array[Double](draws) }
    for (d <- 0 until draws; (name, mk, act) <- chosen) {
      spark.sparkContext.setJobDescription(s"benchx:$name:$d")
      results(name)(d) = time(act(mk()))
    }
    val qJson = results.map { case (k, v) =>
      s""""$k":${fm(v.min)}"""
    }.mkString("{", ",", "}")
    val dJson = results.map { case (k, v) =>
      s""""$k":${v.map(fm).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    println(s"""{"benchx":$qJson,"draws":$dJson,"sf":"$sfDir","n_files":$nFiles}""")
    Console.out.flush()
    spark.stop()
  }

  private def fm(d: Double): String = {
    val v = math.rint(d * 1000) / 1000
    if (v.isNaN || v.isInfinite) "0" else v.toString
  }
}
