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
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFP", (cores * 4).toString))
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
    // GRAFT_JOBLOG=1: print per-Spark-job wall durations (decomposition)
    if (sys.env.contains("GRAFT_JOBLOG")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, System.nanoTime()); ()
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.getOrDefault(j.jobId, 0L)
          println(f"JOBLOG ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          val m = i.taskMetrics
          println(f"STAGELOG ${i.stageId}%4d tasks=${i.numTasks}%4d wall=$wall%7.2f " +
            f"exec=${m.executorRunTime / 1e3}%8.2f in=${m.inputMetrics.bytesRead}%12d " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead}%12d sw=${m.shuffleWriteMetrics.bytesWritten}%12d " +
            i.name.take(60))
        }
      })
    }
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
      ("probe_unigram_counts", () => corpus.select(col("doc_id"),
          org.apache.spark.sql.functions.explode(
            graft.functions.GraftFunctions.graft_tokens(col("content"))).as("tok"))
        .groupBy(col("tok"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("c")), noop),
      // one-off cardinality probe: how big are the span keep set and its
      // surviving window rows on this corpus?
      ("probe_span_sizes", () => {
        val wins = corpus.select(col("doc_id"),
            org.apache.spark.sql.functions.posexplode(
              graft.functions.GraftFunctions.graft_shingle_hash_pairs(
                col("content"), 12, distinct = false)))
          .select(col("doc_id"), col("col.h1").as("h1"), col("col.h2").as("h2"))
        val keep = Dedup.spanKeepCounts(wins.select(col("h1"), col("h2")), 64)
        val nKeep = keep.count()
        val nWins = wins.count()
        val nSurv = wins.join(
          org.apache.spark.sql.functions.broadcast(keep), Seq("h1", "h2"), "left_semi").count()
        println(s"SPAN_SIZES wins=$nWins keep=$nKeep survivors=$nSurv")
        spark.range(1).toDF("x")
      }, cnt),
      // isolate the broadcast-semi probe cost over the window scan
      ("probe_span_semi", () => {
        import spark.implicits._
        val wins = corpus.select(col("doc_id"),
            org.apache.spark.sql.functions.posexplode(
              graft.functions.GraftFunctions.graft_shingle_hash_pairs(
                col("content"), 12, distinct = false)))
          .select(col("doc_id"), (col("pos") + 1).as("pos"),
            col("col.h1").as("h1"), col("col.h2").as("h2"))
        val keep = Dedup.spanKeepCounts(
          wins.select(col("h1"), col("h2")), 64).collect()
        val keepDf = spark.createDataset(
          keep.toSeq.map(r => (r.getLong(0), r.getLong(1)))).toDF("h1", "h2")
        wins.join(org.apache.spark.sql.functions.broadcast(keepDf),
          Seq("h1", "h2"), "left_semi")
      }, noop),
      // A/B alternative for the span count pass: skip the (useless at
      // ~unique-key cardinality) partial hash aggregate — raw (h1, h2)
      // repartition + one open-addressed count map per partition
      ("probe_span_keep_rdd", () => {
        val winsH = corpus.select(
            org.apache.spark.sql.functions.explode(
              graft.functions.GraftFunctions.graft_shingle_hash_pairs(
                col("content"), 12, distinct = false)).as("sh"))
          .select(col("sh.h1").as("h1"), col("sh.h2").as("h2"))
        val rep = winsH.repartition(col("h1"), col("h2"))
        val maxOcc = 64
        val outRdd = rep.queryExecution.toRdd.mapPartitions { it =>
          var cap = 1 << 20
          var mask = cap - 1
          var k1 = new Array[Long](cap)
          var k2 = new Array[Long](cap)
          var cnt = new Array[Int](cap)
          var n = 0
          def grow(): Unit = {
            val o1 = k1; val o2 = k2; val oc = cnt; val ocap = cap
            cap *= 2; mask = cap - 1
            k1 = new Array[Long](cap); k2 = new Array[Long](cap); cnt = new Array[Int](cap)
            var i = 0
            while (i < ocap) {
              if (oc(i) != 0) {
                var j = (java.lang.Long.hashCode(o1(i) * 31 + o2(i)) & mask)
                while (cnt(j) != 0) j = (j + 1) & mask
                k1(j) = o1(i); k2(j) = o2(i); cnt(j) = oc(i)
              }
              i += 1
            }
          }
          while (it.hasNext) {
            val row = it.next()
            val a = row.getLong(0); val b = row.getLong(1)
            if (n * 2 >= cap) grow()
            var j = (java.lang.Long.hashCode(a * 31 + b) & mask)
            var done = false
            while (!done) {
              if (cnt(j) == 0) { k1(j) = a; k2(j) = b; cnt(j) = 1; n += 1; done = true }
              else if (k1(j) == a && k2(j) == b) { cnt(j) += 1; done = true }
              else j = (j + 1) & mask
            }
          }
          val out = Seq.newBuilder[org.apache.spark.sql.catalyst.InternalRow]
          var i = 0
          while (i < cap) {
            if (cnt(i) >= 2 && cnt(i) <= maxOcc)
              out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                Array[Any](k1(i), k2(i)))
            i += 1
          }
          out.result().iterator
        }
        org.apache.spark.sql.classic.GraftBridge.internalDf(spark, outRdd,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("h1",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("h2",
              org.apache.spark.sql.types.LongType, nullable = false))))
      }, noop),
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
    chosen.foreach { case (name, mk, act) =>
      val df = mk()
      act(df)
      if (sys.env.contains("GRAFT_EXEPLAN"))
        println(s"EXEPLAN $name:\n${df.queryExecution.executedPlan}\nEXEPLAN_END")
      results(name) = new Array[Double](draws)
    }
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
