package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video travel
  * as opaque `binary` payloads with typed metadata; decode / feature
  * extraction runs batched per partition (the Scala analog of a
  * `mapInPandas` batch UDF: one decoder instance per partition, amortized
  * over rows, never per-row driver round trips).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — behind [[MediaDecoder]]: `DeterministicFakeDecoder` produces
  * seeded, content-derived features so the Spark-side plumbing (schema,
  * batch shape, partitioning, frame sampling) is real and testable; a
  * JNI/javax-imageio decoder drops in behind the same trait on a real
  * cluster.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),   // image/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true), // audio/video
    StructField("payload", BinaryType, nullable = false)
  ))

  final case class MediaFeature(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Batched decode + feature extraction contract. Implementations must be
    * serializable and cheap to construct once per partition.
    */
  trait MediaDecoder extends Serializable {
    def name: String
    /** Decode one payload into a fixed-dim feature vector. */
    def features(modality: String, payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decoder: deterministic content-derived pseudo-features (md5-fed
    * PRN per dim). Replaces the real codec — see class doc.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    val name = "fake"
    def features(modality: String, payload: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(modality.getBytes("UTF-8"))
      val h = md.digest(payload)
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        // 2 digest bytes per dim, cycled — stable across runs and JVMs
        val b0 = h(i * 2 % h.length) & 0xff
        val b1 = h((i * 2 + 1) % h.length) & 0xff
        out(i) = ((b0 << 8 | b1) / 32768.0f) - 1.0f
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table derived from the documents table —
    * payload bytes are the doc text (opaque stand-in), modality round-robins
    * by id. This is the test/bench input generator, not a decoder.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        lit("application/octet-stream").as("mime"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(640)).otherwise(lit(null).cast("int")).as("width"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(480)).otherwise(lit(null).cast("int")).as("height"),
        when(pmod(col("doc_id"), lit(3)) =!= 0, col("n_chars") * 10).otherwise(lit(null).cast("long")).as("duration_ms"),
        encode(col("text"), "UTF-8").as("payload"))
  }

  /** Batched feature extraction: repartition by modality hash so one
    * partition holds one modality's batches (decoder state reuse), then one
    * decoder instance per partition processes rows streaming.
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = DeterministicFakeDecoder,
                      dim: Int = 16, partitions: Int = 0): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    media.select(col("media_id").cast("long"), col("modality"), col("payload"))
      .repartition(p, col("modality"), pmod(col("media_id"), lit(64)))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // one decoder per partition — the batch amortization point
        val d = decoder
        it.map { case (id, modality, payload) =>
          MediaFeature(id, modality, payload.length.toLong,
            d.features(modality, payload, dim))
        }
      }
  }

  /** Frame sampling for video payloads: deterministic every-nth-window byte
    * slices standing in for frames (`payload` is opaque; a real decoder
    * would seek keyframes). Output one row per sampled frame with its
    * offset — the schema a real frame extractor feeds downstream.
    */
  def sampleFrames(media: DataFrame, everyBytes: Int = 256,
                   frameBytes: Int = 64, maxFrames: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("modality") === "video")
      .select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val n = math.min(maxFrames, math.max(0, payload.length / everyBytes))
        (0 until n).iterator.map { f =>
          val off = f * everyBytes
          val end = math.min(off + frameBytes, payload.length)
          (id, f, off.toLong, java.util.Arrays.copyOfRange(payload, off, end))
        }
      }.toDF("media_id", "frame_idx", "byte_offset", "frame_payload")
  }
}
