package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (training-data pipeline extension): treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extract / frame-sample as partition-wise batch
  * transforms.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * metadata projection — is real and tested. The actual media decode is
  * STUBBED (this environment has no image/audio codecs): [[FakeCodec]]
  * is a clearly-marked deterministic stand-in that "decodes" bytes into a
  * fixed-size feature vector (byte histogram + moments). Swapping in a
  * real codec is a one-function change inside the same `mapPartitions`
  * shape (the Scala analogue of a Python `mapInPandas` batch UDF).
  *
  * Scale notes: media blobs make rows wide — the module repartitions by
  * target partition BYTES (not row count) before decode so a partition's
  * batch fits executor memory, and keeps metadata in separate narrow
  * columns so pruning avoids dragging blobs through metadata-only queries.
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_sample_rate", IntegerType, nullable = true)))

  /** Lift any table with an id + string column into a media table
    * (deterministic fake payloads — stands in for reading real blobs). */
  def fromText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 3 === 0, lit("image"))
        .when(col(idCol) % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      col(textCol).cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("meta_width",
        when(col("kind") === "image", (col("media_id") % 1920 + 1).cast("int")))
      .withColumn("meta_height",
        when(col("kind") === "image", (col("media_id") % 1080 + 1).cast("int")))
      .withColumn("meta_sample_rate",
        when(col("kind") === "audio", lit(16000)))

  /** ??? REAL CODEC GOES HERE ??? — deterministic stand-in: 16-bin byte
    * histogram (normalised) + mean byte + length, as Array[Float].
    * Marked fake; only the surrounding plumbing is the deliverable. */
  object FakeCodec {
    val featureDim = 18
    def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      if (payload == null || payload.isEmpty)
        return new Array[Float](featureDim)
      var sum = 0L
      payload.foreach { b =>
        hist((b & 0xff) >> 4) += 1f
        sum += (b & 0xff)
      }
      val n = payload.length.toFloat
      val normed = hist.map(_ / n)
      normed ++ Array(sum / n / 255f, math.min(1f, n / 1e6f))
    }
  }

  private val featureType = ArrayType(FloatType, containsNull = false)

  /** Decode/feature-extract as a partition-wise batch transform — the
    * Scala shape of a `mapInPandas` batch UDF: iterator in, iterator out,
    * one task per partition, no per-row JVM boundary. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "payload") :+
        StructField("features", featureType, nullable = false))
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.indices.filterNot(_ == payloadIdx)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats = FakeCodec.decodeToFeatures(
          r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keepIdx.map(r.get) :+ feats.toSeq)
      }
    }(encoder)
  }

  /** Size partitions by payload bytes before the (memory-hungry) decode:
    * target ~`targetMb` of payload per partition. At 100 TB this is the
    * difference between stable decode tasks and OOM on skewed media. */
  def repartitionByBytes(media: DataFrame, targetMb: Int = 128): DataFrame = {
    val totalBytes = media.agg(sum(col("n_bytes"))).head().getLong(0)
    val parts = math.max(1,
      (totalBytes / (targetMb.toLong * 1024 * 1024)).toInt)
    media.repartition(parts)
  }

  /** Frame-sampling shape for video payloads: emit every `stride`-th
    * fixed-size window of the payload as a "frame" (explode → one row per
    * frame; a real impl swaps the byte-slice for a codec frame grab). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024,
      stride: Int = 4): DataFrame = {
    val nFrames = greatest(lit(1),
      (col("n_bytes") / lit(frameBytes.toLong * stride)).cast("int"))
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes * $stride + 1, $frameBytes)"))
      .drop("payload")
  }
}
