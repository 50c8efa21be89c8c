package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{IndexBuild, IndexConfig}
import graft.ml.Dedup

/** Throwaway profiling main (not part of the driver contract).
  * args: cores shufflePartitions nFiles [concurrentRanges]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    if (args(0) == "queries") { profQueries(args.drop(1)); return }
    val cores = args(0).toInt
    val sp = args(1).toInt
    val n = args(2).toLong
    val conc = if (args.length > 3) args(3).toInt else 4
    val filters = if (args.length > 4) args(4).toBoolean else true
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(fn: => A): A = {
      val t0 = System.nanoTime(); val a = fn
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val dir = s"/tmp/prof-corpus-$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      time("synth+write") {
        Corpus.synthesize(spark, n, 42L, 128).write.mode("overwrite").parquet(dir)
      }
    }
    val corpus = spark.read.parquet(dir)
    val rss = if (args.length > 5) args(5).toInt else 7
    val cfg = IndexConfig(segShift = 9, rangeSegsShift = rss, concurrentRanges = conc,
      filterColumns = if (filters) Seq("lang") else Seq.empty)
    // JIT warmup
    IndexBuild.build(spark, corpus.where(col("doc_id") < 2000),
      Files.createTempDirectory("prof-warm-").toString, cfg)
    time(s"full build cores=$cores sp=$sp n=$n conc=$conc") {
      IndexBuild.build(spark, corpus, Files.createTempDirectory("prof-idx-").toString, cfg)
    }
    // fingerprint: native Expression vs interpreted HOF composition.
    // agg(min(fp)) forces the fp column (count() would prune it away).
    val fpSample = corpus.limit(20000).repartition(cores * 2).cache()
    fpSample.count()
    time("fingerprint native (GraftFingerprint)") {
      graft.ml.TextStats.fingerprint(fpSample).agg(min(col("fp"))).collect()
    }
    time("fingerprint HOF (transform+md5, interpreted)") {
      graft.ml.TextStats.fingerprintHof(fpSample).agg(min(col("fp"))).collect()
    }
    spark.stop()
  }

  /** Query-path latency probe over the Bench-shaped corpus/index:
    * args: [cores]. Times the bench's WAND/scan routing headliners.
    */
  def profQueries(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 600000L
    val dir = s"/tmp/prof-corpus-$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      Corpus.synthesize(spark, n, 42L, 128).write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val idxDir = s"/tmp/prof-qidx-$n"
    val cfg = IndexConfig(segShift = 9, rangeSegsShift = 7)
    IndexBuild.build(spark, corpus, idxDir, cfg)
    val engine = new graft.query.Engine(new graft.query.Index(spark, idxDir))
    engine.index.stats
    val hotRare = Seq("w:license" -> 1.0, "w:apache" -> 1.0, "w:hashimpl" -> 1.0,
      "w:mergefactory" -> 1.0, "w:scanptr" -> 1.0, "w:sortz" -> 1.0)
    val allHot = Seq("w:license" -> 1.0, "w:copyright" -> 1.0, "w:version" -> 1.0)
    def bench(tag: String)(fn: => Long): Unit = {
      fn // warm
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9 }
      println(f"PROF $tag min=${secs.min}%.3f s runs=${secs.map(s => f"$s%.3f").mkString(",")}")
    }
    bench("wand_hot_rare")(engine.searchByTerms(hotRare, rows = 60).count())
    bench("wand_all_hot")(engine.searchByTerms(allHot, rows = 60).count())
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench("dedup_minhash")(Dedup.minhashPairs(Dedup.minhashBands(
      Dedup.minhashSignatures(Dedup.withDups(Corpus.fromDocuments(spark, sfDir))))).count())
    spark.stop()
  }
}
