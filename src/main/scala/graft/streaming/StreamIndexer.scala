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
    */
  def start(spark: SparkSession, inputDir: String, indexDir: String,
            checkpointDir: String, cfg: IndexConfig): StreamingQuery = {
    spark.readStream
      .schema(corpusSchema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ranges a re-delivered batch carries are already committed and get
        // skipped by the manifest gate — that's the exactly-once property
        if (!batch.isEmpty) IndexBuild.build(spark, batch, indexDir, cfg)
        ()
      }
      .start()
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
