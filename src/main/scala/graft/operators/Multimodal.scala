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
  * mapInPandas on the Python side). Image HEADER decode (`ImageCodec`:
  * PNG/JPEG/GIF dimensions from the container bytes) is REAL —
  * implemented against the container specs in pure JVM and verified
  * by q41's oracle against planted dimensions. Pixel-level decode /
  * resampling is STUBBED (`FakeCodec`): the container has no
  * image/audio libraries, so those steps are a deterministic fake
  * keyed on the payload bytes; everything around them — schema,
  * encoders, partition batching, column pruning — is real and tested.
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
                           image_format: Option[String],
                           width: Option[Int], height: Option[Int],
                           feature: Array[Float])
  case class AssetFrames(asset_id: Long, n_frames: Int,
                         resized_len: Int, frame_hashes: Seq[String])

  /** REAL codec path: image container headers parsed byte-by-byte in
    * pure JVM — no library needed, because PNG/JPEG/GIF all carry
    * their pixel dimensions in fixed, documented header positions
    * (PNG IHDR: bytes 16-23 big-endian; JPEG: the SOFn segment; GIF:
    * the logical screen descriptor, little-endian). This is the
    * decode step that is NOT stubbed: `extractFeatures` runs it on
    * every payload, and q41's oracle checks the recovered dimensions
    * against planted values. */
  object ImageCodec {
    /** (format, width, height) from container magic + header, or None
      * for non-image / truncated / corrupt payloads. Never throws —
      * a malformed byte stream is data, not an error. */
    def imageDims(b: Array[Byte]): Option[(String, Int, Int)] = {
      if (b == null) return None
      def u8(i: Int): Int = b(i) & 0xFF
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      // PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
      // (RFC 2083 §4.1.1) — width/height at fixed offsets 16/20
      if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
          b(3) == 'G' && u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A &&
          u8(7) == 0x0A && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' &&
          b(15) == 'R')
        return Some(("png", be32(16), be32(20)))
      // GIF87a/89a: logical screen descriptor, little-endian 16-bit
      if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        return Some(("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
      // JPEG: SOI then a marker walk to the first frame header (SOFn,
      // n != 4/8/12 which are huffman/arithmetic tables): dimensions
      // sit at fixed offsets inside that segment (ITU T.81 §B.2.2)
      if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
        var p = 2
        while (p + 9 <= b.length) {
          if (u8(p) != 0xFF) return None // desynced: not a marker
          val m = u8(p + 1)
          if (m == 0xFF) p += 1 // fill byte
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) p += 2 // standalone
          else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
            return Some(("jpeg", be16(p + 7), be16(p + 5)))
          else if (m == 0xD9 || m == 0xDA) return None // EOI/scan data: no SOF seen
          else p += 2 + be16(p + 2) // skip variable-length segment
        }
      }
      None
    }
  }

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
          val dims = ImageCodec.imageDims(bytes)
          AssetFeatures(
            asset_id = id,
            modality = modality,
            byte_len = bytes.length.toLong,
            content_hash = md.digest(bytes).map("%02x".format(_)).mkString,
            image_format = dims.map(_._1),
            width = dims.map(_._2),
            height = dims.map(_._3),
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
