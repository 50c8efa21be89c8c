package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.index.{IndexBuild, IndexConfig}

/** Streaming extensions.
  *
  * The reference is strictly batch + request/response (SURVEY.md §2.10) —
  * these are the Spark-native additions a continuously-fed corpus needs:
  *
  *  - [[StreamIndexer]]: incremental index ingestion. Corpus chunks landing
  *    in a directory are indexed micro-batch by micro-batch via
  *    `foreachBatch`; each batch builds new checkpoint ranges. Exactly-once
  *    under retries WITHOUT a transactional sink: ranges are idempotent
  *    (manifest `_SUCCESS` gates visibility, redo is overwrite), so a
  *    replayed batch no-ops. Constraint (asserted): distinct batches must
  *    not share a doc_id range — natural for append-only ingest where each
  *    batch gets fresh id space.
  *
  *  - [[StreamIndexer.eventCounts]]: the standard watermark + tumbling
  *    window aggregation over the `events` stream shape.
  */
object StreamIndexer {

  val corpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("content", StringType),
    StructField("sha", StringType)))

  /** Start incremental ingestion of corpus parquet chunks from `inputDir`.
    * Processes everything currently available, then stops (AvailableNow);
    * restart with the same `checkpointDir` to pick up new chunks only.
    *
    * `maxLiveUnits` > 0 turns on inline maintenance: when the committed
    * unit count exceeds it after a batch, [[IndexBuild.compact]] merges
    * units down (budget = total docs / maxLiveUnits) — the continuous
    * analog of Lucene's merge-on-commit, keeping Index metadata and
    * per-query reader fan-out bounded no matter how many micro-batches
    * have landed. Compaction is idempotent and manifest-atomic, so a
    * retry-after-crash re-enters safely mid-stream.
    *
    * `compactGc = false` defers retired-directory deletion during
    * maintenance (see IndexBuild.compact's gc flag): required when queries
    * are served concurrently from Index instances opened over this
    * indexDir — their cached unit paths must outlive the merge; reclaim
    * later with a periodic compact(gc = true).
    *
    * `upsertKeys` nonempty turns the stream into a CDC-style UPSERT feed
    * (Solr's uniqueKey replace, continuously): each micro-batch indexes
    * its docs AND tombstones every live doc matching a batch row on those
    * key columns ([[IndexBuild.upsert]] — kill shards commit atomically
    * with their range's manifest, replays recompute empty kill sets, so
    * the exactly-once property is unchanged). With inline maintenance on,
    * compaction reclaims the dead versions as the stream runs.
    *
    * `dedupSha = true` turns on exact content deduplication AT INGEST —
    * the streaming twin of the batch pipeline's exact-dedup stage
    * ([[graft.ml.Dedup.exactGroups]]): a doc whose `sha` was already
    * ingested (in any earlier micro-batch, or earlier in this one) is
    * dropped before indexing, via Structured Streaming's stateful
    * `dropDuplicates` — one state-store entry per distinct sha, O(1) per
    * row, versioned with the checkpoint so a replayed batch drops the
    * SAME rows (the skipped-range checksum verify then actually holds
    * under replay). State is retained indefinitely by design (content
    * identity never expires); at 100× scale back the state store with
    * RocksDB (`spark.sql.streaming.stateStore.providerClass`) — one
    * 32-byte key per distinct document, no full-corpus rescan per batch,
    * where the alternative (anti-join each batch against all committed
    * docmeta) re-reads index-sized metadata every trigger. Which
    * duplicate survives is first-arrival in stream order (batch dedup's
    * cluster-min rule needs the whole corpus at once — disclosed
    * difference; the SURVIVOR SET of shas is identical).
    */
  def start(spark: SparkSession, inputDir: String, indexDir: String,
            checkpointDir: String, cfg: IndexConfig,
            readOptions: Map[String, String] = Map.empty,
            maxLiveUnits: Int = 0,
            compactGc: Boolean = true,
            upsertKeys: Seq[String] = Seq.empty,
            dedupSha: Boolean = false): StreamingQuery = {
    val src = spark.readStream
      .schema(corpusSchema)
      .options(readOptions)
      .parquet(inputDir)
    (if (dedupSha) src.dropDuplicates("sha") else src)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ranges a re-delivered batch carries are already committed and get
        // skipped by the manifest gate — that's the exactly-once property.
        // The gate is only safe if the skipped content IS the committed
        // content: verify each skipped range's (n_rows, checksum) against
        // its manifest, so a non-range-aligned batch whose ids collide with
        // committed ranges fails loudly instead of silently losing docs.
        if (!batch.isEmpty) {
          val report =
            if (upsertKeys.nonEmpty)
              IndexBuild.upsert(spark, batch, indexDir, cfg, upsertKeys)
            else IndexBuild.build(spark, batch, indexDir, cfg)
          if (report.rangesSkipped.nonEmpty)
            verifySkippedRanges(spark, batch, indexDir, cfg, report.rangesSkipped)
          if (maxLiveUnits > 0) {
            var live = IndexBuild.liveUnits(spark, indexDir)
            if (live.size > maxLiveUnits) {
              import spark.implicits._
              val totalDocs = IndexBuild.manifests(spark, indexDir, live)
                .agg(sum(col("n_docs")).cast("long")).as[Long].head()
              // ceil-div budget; greedy packing can still overshoot by one
              // batch when unit sizes straddle the budget, so double until
              // bounded (terminates: budget -> Long.Max -> one unit)
              var budget = math.max(1L, (totalDocs + maxLiveUnits - 1) / maxLiveUnits)
              while (live.size > maxLiveUnits) {
                val rep = IndexBuild.compact(spark, indexDir, budget, gc = compactGc)
                if (rep.unitsAfter.size >= live.size)
                  budget = if (budget > Long.MaxValue / 2) Long.MaxValue else budget * 2
                live = rep.unitsAfter
              }
            }
          }
        }
        ()
      }
      .start()
  }

  /** Fail if a batch slice that was skipped by the manifest gate differs
    * from what the committed manifest attests (same order-independent
    * xor-of-xxhash64(doc_id|sha) checksum IndexBuild records).
    */
  def verifySkippedRanges(spark: SparkSession, batch: DataFrame, indexDir: String,
                          cfg: IndexConfig, skipped: Seq[Long]): Unit = {
    import spark.implicits._
    val got = batch
      .groupBy(shiftrightunsigned(col("doc_id"), cfg.rangeShift).as("range_id"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(xxhash64(concat_ws('|', doc_id, sha)))"), lit(0L)).as("checksum"))
      .where(col("range_id").isin(skipped: _*))
      .as[(Long, Long, Long)].collect().map { case (r, n, c) => r -> (n, c) }.toMap
    // per-doc-range attestations survive compaction (the unit holding a
    // range may have merged away, but its DocRangeStat rides along)
    val committed = IndexBuild.docRangeStats(spark, indexDir)
      .where(col("range_id").isin(skipped: _*))
      .as[(Long, Long, Long)].collect().map { case (r, n, c) => r -> (n, c) }.toMap
    val bad = skipped.filter(r => got.get(r) != committed.get(r))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"streamed batch overlaps committed range(s) ${bad.mkString(",")} with DIFFERENT " +
          s"content (batch ${bad.map(got.get)} vs manifest ${bad.map(committed.get)}); " +
          "append batches must use fresh doc_id ranges")
  }

  /** Gap-based sessionization, BATCH form — the oracle-checked semantics:
    * consecutive events of a user with inter-event gaps ≤ `gapMinutes`
    * form one session. Gaps-and-islands: lag over (user, time) marks
    * session starts, a running sum numbers them, one aggregation emits
    * (user_id, session_start_us, n, sum_value_q). Times compare in integer
    * MICROSECONDS (unix_micros / epoch_us) so both engines cut sessions at
    * exactly the same boundary. The window keys on user_id — the natural
    * bounded key (one user's events per partition slice), never a global
    * window. [[sessionizeStream]] is the streaming twin.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 480): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("session_start_us"),
        count(lit(1)).as("n"),
        round(sum(col("value")) * 100).cast("long").as("sum_value_q"))
      .select("user_id", "session_start_us", "n", "sum_value_q")
  }

  final case class OpenSession(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionRow(user_id: Long, session_start_us: Long, n: Long, sum_value_q: Long)

  /** Gap-based sessionization, STREAMING form: the custom-state operator
    * family the reference (batch/request-response) has no analog for —
    * `flatMapGroupsWithState` keyed by user with an EVENT-TIME timeout.
    * Each micro-batch folds its (sorted) events into the user's open
    * session, emitting sessions closed by a gap; the open session stays in
    * the state store with a timeout at last+gap, so the watermark passing
    * that instant emits it with no further input — exactly the batch
    * semantics of [[sessionize]] for every session whose close precedes
    * the final watermark (tested against it).
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapMinutes: Int = 480): org.apache.spark.sql.Dataset[SessionRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // late events ≤ the 10-minute watermark allowance must fall within the
    // session gap for the out-of-order merge below to be chronologically
    // exact (a non-dropped event is always ≥ watermark ≥ lastSeen − 10min)
    require(gapMinutes >= 10,
      s"gapMinutes ($gapMinutes) must cover the 10-minute watermark delay")
    val gapUs = gapMinutes * 60L * 1000000L
    def close(uid: Long, s: OpenSession): SessionRow =
      // same HALF_UP (away from zero) rule as Spark SQL round() in the
      // batch twin — math.round would differ on negative .5 halves
      SessionRow(uid, s.start, s.n,
        java.math.BigDecimal.valueOf(s.sum * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      // ts must survive the projection: the event-time-timeout checker
      // looks for the watermarked attribute in flatMapGroupsWithState's child
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"), col("ts"))
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, it: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val out = state.getOption.map(s => close(uid, s))
            state.remove()
            out.iterator
          } else {
            val evs = it.toArray.sortBy(_._2)
            var open = state.getOption
            val closed = scala.collection.mutable.ListBuffer[SessionRow]()
            evs.foreach { case (_, us, v, _) =>
              open match {
                case Some(s) if us - s.last <= gapUs =>
                  // a late (out-of-order across micro-batches) event may
                  // precede the open session's start — extend it backward,
                  // exactly what the batch gaps-and-islands twin computes
                  open = Some(OpenSession(math.min(s.start, us),
                    math.max(s.last, us), s.n + 1, s.sum + v))
                case Some(s) =>
                  closed += close(uid, s)
                  open = Some(OpenSession(us, us, 1L, v))
                case None =>
                  open = Some(OpenSession(us, us, 1L, v))
              }
            }
            open.foreach { s =>
              val timeoutMs = (s.last + gapUs) / 1000L + 1L
              if (timeoutMs <= state.getCurrentWatermarkMs()) {
                // replaying history: the gap horizon already passed the
                // watermark — the session is final now (a timeout in the
                // past is also illegal to register)
                closed += close(uid, s)
                if (state.exists) state.remove()
              } else {
                state.update(s)
                // fires once the event-time watermark passes the gap horizon
                state.setTimeoutTimestamp(timeoutMs)
              }
            }
            closed.iterator
          }
        })
  }

  /** Watermarked tumbling-window event counts (streaming-capable plan:
    * append mode with a 10-minute watermark). Works identically over a
    * bounded read for the batch oracle.
    */
  def eventCounts(events: DataFrame, withWatermark: Boolean = true): DataFrame = {
    // driver parquet stores ts as TIMESTAMP_NTZ; watermarks need LTZ
    // (session TZ pinned to UTC, so the cast is deterministic)
    val ltz = events.withColumn("ts", col("ts").cast("timestamp"))
    val src = if (withWatermark) ltz.withWatermark("ts", "10 minutes") else ltz
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * 100).cast("long").as("sum_value_q"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value_q"))
  }
}
