package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 #51): image/audio/video as
  * opaque binary columns with typed metadata, processed per-partition.
  *
  * The Spark-side design is real: stable schema, per-partition batch
  * processing (`mapPartitions` over Rows — the Scala analogue of a
  * Pandas-UDF batch), partitioning preserved, deterministic outputs.
  * The *codec* step is stubbed (no image/audio libs in this container):
  * `decodeStub` derives a deterministic pseudo-feature vector from the
  * bytes, clearly marked — swap `decodeBatch` for a real decoder
  * without touching the pipeline shape.
  */
object Multimodal {

  /** Canonical multimodal schema: id + modality + opaque payload +
    * typed metadata. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic fake "decode" of a payload into `dim` features —
    * STUB for the real image/audio decoder (not available here).
    * Deterministic: features depend only on the bytes. */
  private[multimodal] def decodeBatch(content: Array[Byte], dim: Int): Array[Double] = {
    // ??? real decoder goes here (e.g. JPEG -> pixels -> model features)
    var h = 1125899906842597L
    content.foreach(b => h = 31 * h + b)
    Array.tabulate(dim) { i =>
      val x = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
      val m = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
      ((m >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
  }

  /** Feature extraction over binary payloads: batch-shaped
    * per-partition processing, schema widened with `features`. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = df.schema.add(StructField("features", ArrayType(DoubleType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val feats = if (bytes == null) null else decodeBatch(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** "Resize" stub: records the target size in metadata and re-tags the
    * payload (real implementation would transcode bytes). Keeps the
    * narrow, no-shuffle shape a real resize kernel would have. */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("width", when(col("modality") === "image", lit(w)).otherwise(col("width")))
      .withColumn("height", when(col("modality") === "image", lit(h)).otherwise(col("height")))

  /** Frame sampling stub for video: emits (asset_id, frame_no) rows at
    * `everyMs` spacing from duration metadata — the distributed
    * explode shape of real frame extraction. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("modality") === "video" && col("duration_ms").isNotNull)
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ms"))

  /** Synthetic deterministic asset table for tests/demos. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val content = Array.tabulate[Byte](64)(j => ((i * 131 + j * 7) % 251).toByte)
      Row(i.toLong, modality, content,
        if (modality == "image") Integer.valueOf(640) else null,
        if (modality == "image") Integer.valueOf(480) else null,
        if (modality == "audio") Integer.valueOf(16000) else null,
        if (modality != "image") java.lang.Long.valueOf(1000L * (i % 30 + 1)) else null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }
}
