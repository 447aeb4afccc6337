package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns travelling next to typed
  * metadata — the Spark-side contract is:
  *   asset schema: (asset_id long, modality string, payload binary,
  *                  meta struct(width int, height int, sample_rate int,
  *                             duration_ms long))
  * Decode / feature-extraction runs per-partition (one codec init per
  * partition, not per row — the same batching rationale as
  * mapInPandas on the Python side). The actual codec is STUBBED here
  * (`FakeCodec`): the container has no image/audio libraries, so the
  * decode step is a deterministic fake keyed on the payload bytes;
  * everything around it — schema, encoders, partition batching,
  * column pruning — is real and tested.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)))

  case class AssetMeta(width: Option[Int], height: Option[Int],
                       sample_rate: Option[Int], duration_ms: Option[Long])
  case class Asset(asset_id: Long, modality: String,
                   payload: Array[Byte], meta: Option[AssetMeta])
  case class AssetFeatures(asset_id: Long, modality: String,
                           byte_len: Long, content_hash: String,
                           feature: Array[Float])
  case class AssetFrames(asset_id: Long, n_frames: Int,
                         resized_len: Int, frame_hashes: Seq[String])

  /** STUB codec: a real build links an image/audio library here
    * (none ships in this container). Every op is deterministic in the
    * payload bytes so the Spark-side plumbing is fully testable; the
    * signatures are the real contract a codec drops into. */
  object FakeCodec {
    /** "Feature extraction": dim-sized byte-histogram moments. */
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      if (payload == null || payload.isEmpty) return Array.fill(dim)(0.0f)
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, payload.length / dim)
      out.map(_ / n)
    }

    /** "Resize": deterministic downsample of the payload to at most
      * `targetBytes` by fixed-stride selection (stands in for image
      * resampling: same shape — bytes in, smaller bytes out). */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
      if (payload == null || payload.length <= targetBytes) return payload
      val stride = payload.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => payload((i * stride).toInt))
    }

    /** "Frame sampling": split the payload into `frameSize` chunks and
      * keep every `every`-th chunk (stands in for video frame
      * extraction; returns the kept frames). */
    def sampleFrames(payload: Array[Byte], frameSize: Int,
                     every: Int): Seq[Array[Byte]] = {
      if (payload == null || payload.isEmpty) return Seq.empty
      payload.grouped(frameSize).zipWithIndex
        .collect { case (frame, i) if i % every == 0 => frame }
        .toSeq
    }
  }

  /** Wrap a text table into the asset contract (test harness for the
    * plumbing — payload := utf8 bytes). */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit("text").as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        length(col(textCol)).cast("long").as("duration_ms")).as("meta"))

  /** Per-partition decode + featurize. The Dataset[T] boundary gives a
    * typed, columnar-prunable pipeline: only (asset_id, modality,
    * payload) are read from storage — meta is pruned unless used. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec/digest init (amortized over the batch)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          md.reset()
          AssetFeatures(
            asset_id = id,
            modality = modality,
            byte_len = bytes.length.toLong,
            content_hash = md.digest(bytes).map("%02x".format(_)).mkString,
            feature = FakeCodec.features(bytes))
        }
      }
  }

  /** Per-partition resize + frame-sample pipeline over video-shaped
    * payloads — the batch shape (one codec per partition, frames
    * emitted per asset) is the real deliverable; the codec is the
    * deterministic stub. */
  def resizeAndSample(spark: SparkSession, assets: DataFrame,
                      targetBytes: Int = 256, frameSize: Int = 64,
                      every: Int = 2): Dataset[AssetFrames] = {
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          val resized = FakeCodec.resize(
            if (payload == null) Array.empty[Byte] else payload, targetBytes)
          val frames = FakeCodec.sampleFrames(resized, frameSize, every)
          AssetFrames(id, frames.size, resized.length,
            frames.map(f => md.digest(f).map("%02x".format(_)).mkString))
        }
      }
  }

  /** Pure-SQL metadata path (no decode): byte length + md5 via
    * codegen'd built-ins — the query-able face of a media table. */
  def payloadStats(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("modality"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("content_hash"))
}
