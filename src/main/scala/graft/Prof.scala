package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{IndexBuild, IndexConfig}

/** Throwaway profiling main (not part of the driver contract).
  * args: cores shufflePartitions nFiles [concurrentRanges]
  */
object Prof {
  def main(args: Array[String]): Unit = {
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
}
