package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-vector ingestion + encoding — the reference's second ingestion
  * family, grafted as one composable operator set:
  *
  *  - [[fromCsv]]: header-named class-weight CSV -> (vec_id, embedding)
  *    (ref: tools/EncodeAndHashCSV.java:79-124 — header-derived classes,
  *    one weight column per class);
  *  - [[fromTextLines]]: `id;w1 w2 w3 ...` feature lines -> same shape
  *    (ref: tools/IndexingFromTextFile.java:23-227);
  *  - [[topNFeatures]]: per row keep the N largest weights that clear a
  *    significance floor of sigFrac·max, encode each kept dim as an index
  *    term (ref: EncodeAndHashCSV.java:135-199 — top-32 cutoff, >=0.8·max
  *    significance; Utilities.java:74-82 — top-N of a vector);
  *  - [[minMaxNormalize]]: per-row min-max normalization
  *    (ref: tools/Utilities.java:43-52).
  *
  * All per-row column expressions + one window per vector — no shuffle
  * beyond the window's hash partitioning on vec_id, which at 100 TB is the
  * natural partition key anyway. Mirrored in SQL by
  * [[graft.sql.OracleMl.topNFeaturesSql]] / [[graft.sql.OracleMl.minMaxSql]].
  */
object Features {

  /** Header CSV -> (vec_id, embedding): first column the id, every other
    * column a class weight (header gives class names; order preserved).
    */
  def fromCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val idCol = raw.columns.head
    val classes = raw.columns.tail
    raw.select(col(idCol).cast("long").as("vec_id"),
      array(classes.map(c => col(c).cast("float")): _*).as("embedding"))
  }

  /** `id;w1 w2 w3 ...` lines -> (vec_id, embedding). */
  def fromTextLines(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .filter(l => l != null && l.nonEmpty)
      .map { line =>
        val sep = line.indexOf(';')
        require(sep > 0, s"bad feature line: $line")
        (line.substring(0, sep).trim.toLong,
          line.substring(sep + 1).trim.split("\\s+").map(_.toFloat).toSeq)
      }
      .toDF("vec_id", "embedding")
  }

  /** Top-N class-weight cutoff with significance floor: per vec_id, the N
    * largest weights (ties: dim asc) that are positive and >= sigFrac·max.
    * Each kept dim becomes an index-ready term "d:<dim zero-padded>".
    * Output (vec_id, rank, dim, w_q, term).
    */
  def topNFeatures(vectors: DataFrame, n: Int, sigFrac: Double): DataFrame = {
    val byVec = Window.partitionBy(col("vec_id"))
    vectors
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "w")))
      .withColumn("w", col("w").cast("double"))
      .withColumn("max_w", max(col("w")).over(byVec))
      .withColumn("rank", row_number().over(
        byVec.orderBy(col("w").desc, col("dim").asc)).cast("long"))
      .where(col("rank") <= n && col("w") > 0 && col("w") >= col("max_w") * sigFrac)
      .select(col("vec_id"), col("rank"), col("dim").cast("long").as("dim"),
        round(col("w") * lit(1e6)).cast("long").as("w_q"),
        concat(lit("d:"), lpad(col("dim").cast("string"), 3, "0")).as("term"))
  }

  /** Per-row min-max normalization: (w − min) / (max − min), quantized;
    * constant rows normalize to 0. Output (vec_id, dim, norm_q).
    */
  def minMaxNormalize(vectors: DataFrame): DataFrame = {
    val byVec = Window.partitionBy(col("vec_id"))
    vectors
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "w")))
      .withColumn("w", col("w").cast("double"))
      .withColumn("min_w", min(col("w")).over(byVec))
      .withColumn("max_w", max(col("w")).over(byVec))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        when(col("max_w") > col("min_w"),
          round((col("w") - col("min_w")) / (col("max_w") - col("min_w")) * lit(1e6)))
          .otherwise(lit(0.0)).cast("long").as("norm_q"))
  }

  /** Symmetric per-vector int8 quantization — the standard storage/compute
    * compression for embedding columns at corpus scale (4x smaller than
    * float32, dot products in integer SIMD): scale = max|w|, q8 =
    * round(w·127/scale) ∈ [−127, 127], all-zero vectors quantize to 0.
    * Per-row columnar (window keyed by vec_id — the natural bounded key);
    * scale is emitted quantized so the inverse transform is recoverable.
    * Output (vec_id, dim, q8, scale_q).
    */
  def quantizeInt8(vectors: DataFrame): DataFrame = {
    val byVec = Window.partitionBy(col("vec_id"))
    vectors
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "w")))
      .withColumn("w", col("w").cast("double"))
      .withColumn("maxabs", max(abs(col("w"))).over(byVec))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        when(col("maxabs") > 0, round(col("w") * lit(127.0) / col("maxabs")))
          .otherwise(lit(0.0)).cast("long").as("q8"),
        round(col("maxabs") * lit(1e6)).cast("long").as("scale_q"))
  }
}
