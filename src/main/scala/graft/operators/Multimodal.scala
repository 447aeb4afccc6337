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
  * mapInPandas on the Python side). HEADER decode is REAL for both
  * modalities — `ImageCodec` (PNG/JPEG/GIF dimensions) and
  * `AudioCodec` (WAV sample rate / channels / bit depth / duration
  * from the RIFF chunk walk), implemented against the container
  * specs in pure JVM and verified by q41/q87's oracles against
  * planted values. Sample-level decode is ALSO real for all three
  * modalities: `PngCodec` (zlib inflate + scanline unfilter → pixels,
  * q91), `PcmCodec` (int16 PCM → RMS/peak/crossings, q92),
  * `AviCodec` (AVI container walk → raw-DIB/MJPEG frames →
  * sample/resize, q94), and `ImageIoCodec` (the JDK's own
  * JPEG/GIF/BMP decoders). The only payloads without a sample-level
  * path are codecs that genuinely need an external library (H.264,
  * Vorbis, MP3/AAC) — those fall back to the honest `ByteFeatures`
  * content descriptor, never a fake decode.
  */
object Multimodal {

  // payloads are already in-memory byte arrays: without this, every
  // ImageIO.read (ImageIoCodec AND AviCodec's MJPEG frames) wraps its
  // stream in a FileCacheImageInputStream — one executor-disk
  // temp-file create/write/delete PER ASSET. JVM-global, set once at
  // object init (this object loads before any codec call).
  javax.imageio.ImageIO.setUseCache(false)

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
                           feature: Array[Float],
                           feature_kind: String)
  case class AssetFrames(asset_id: Long, n_frames: Int,
                         resized_len: Int, frame_hashes: Seq[String])
  case class AssetAudioMeta(asset_id: Long, modality: String,
                            byte_len: Long,
                            audio_format: Option[String],
                            sample_rate: Option[Int],
                            channels: Option[Int],
                            bits_per_sample: Option[Int],
                            duration_ms: Option[Long])

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

  /** REAL audio codec path: WAV (RIFF) container headers parsed in
    * pure JVM — like `ImageCodec`, no library needed, because the
    * RIFF container (RIFF1991 / WAVE spec) puts everything a metadata
    * probe wants in the `fmt ` chunk (PCM format tag, channel count,
    * sample rate, byte rate, bits per sample; all little-endian) and
    * the `data` chunk header declares the payload size, from which
    * duration follows as dataSize·1000/byteRate. */
  object AudioCodec {
    /** (sample_rate, channels, bits_per_sample, duration_ms) from the
      * RIFF/WAVE chunk walk, or None for non-WAV / truncated /
      * corrupt payloads. Never throws — malformed bytes are data, not
      * an error. The declared `data` chunk size is trusted even when
      * the payload is truncated after the header: a metadata probe
      * over a byte-range read sees exactly that shape at scale. */
    def wavMeta(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (b == null || b.length < 12) return None
      def u8(i: Int): Int = b(i) & 0xFF
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
        return None
      var p = 12
      var sampleRate, channels, bits = 0
      var byteRate = 0L
      var dataSize = -1L
      var fmtSeen = false
      while (p + 8 <= b.length && (!fmtSeen || dataSize < 0)) {
        val size = le32(p + 4)
        if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ') {
          if (size < 16 || p + 8 + 16 > b.length) return None // fmt must carry the PCM block
          channels = le16(p + 10)
          sampleRate = le32(p + 12).toInt
          byteRate = le32(p + 16)
          bits = le16(p + 22)
          fmtSeen = true
        } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' && b(p + 3) == 'a') {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte (RIFF spec)
        p += 8 + (size + (size & 1L)).min(Int.MaxValue).toInt
        if (p < 0) return None // chunk-size overflow: corrupt
      }
      if (fmtSeen && dataSize >= 0 && byteRate > 0 && sampleRate > 0)
        Some((sampleRate, channels, bits, dataSize * 1000L / byteRate))
      else None
    }
  }

  /** Per-partition WAV-header decode over audio-shaped payloads — the
    * audio twin of `extractFeatures`'s image path, REAL end-to-end
    * (no stub): `AudioCodec.wavMeta` recovers sample rate / channels /
    * bit depth / duration from the container bytes; non-WAV payloads
    * surface as nulls, never errors. */
  def extractAudioMeta(spark: SparkSession, assets: DataFrame): Dataset[AssetAudioMeta] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val meta = AudioCodec.wavMeta(bytes)
          AssetAudioMeta(
            asset_id = id,
            modality = modality,
            byte_len = bytes.length.toLong,
            audio_format = meta.map(_ => "wav"),
            sample_rate = meta.map(_._1),
            channels = meta.map(_._2),
            bits_per_sample = meta.map(_._3),
            duration_ms = meta.map(_._4))
        }
      }
  }

  /** REAL video codec path: MP4 (ISO base media file format,
    * ISO/IEC 14496-12) container headers parsed in pure JVM — the
    * third modality's twin of `ImageCodec`/`AudioCodec`. The format
    * is a tree of length-prefixed boxes ([u32 size][4cc type], size 1
    * → 64-bit largesize follows, size 0 → to end); the metadata a
    * probe wants sits in `moov/mvhd` (timescale + duration, so
    * duration_ms = duration·1000/timescale) and `moov/trak/tkhd`
    * (width/height as 16.16 fixed point). */
  object VideoCodec {
    /** (duration_ms, width, height) from the box walk, or None for
      * non-MP4 / truncated / corrupt payloads. Never throws. The
      * first track with nonzero tkhd dimensions wins (audio tracks
      * carry 0×0); an audio-only movie reports width=height=0. */
    def mp4Meta(b: Array[Byte]): Option[(Long, Int, Int)] = {
      if (b == null || b.length < 16) return None
      def u8(i: Int): Int = b(i) & 0xFF
      def be32(i: Int): Long =
        ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xFFFFFFFFL
      def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
      def typ(i: Int, t: String): Boolean =
        b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)
      if (!typ(4, "ftyp")) return None // brand box is mandatory first (§4.3)

      var timescale = 0L
      var duration = -1L
      var width = 0
      var height = 0

      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 4) return // moov/trak nesting never exceeds this
        var p = start
        while (p + 8 <= end) {
          var size = be32(p)
          var hdr = 8
          if (size == 1L) {
            if (p + 16 > end) return
            size = be64(p + 8); hdr = 16
          } else if (size == 0L) size = (end - p).toLong // "to end of enclosing"
          // a declared size that escapes the enclosing box (or its own
          // header) is corruption — stop walking, keep what we have
          if (size < hdr || size > (end - p).toLong) return
          val body = p + hdr
          val boxEnd = p + size.toInt
          if (typ(p + 4, "moov") || typ(p + 4, "trak")) walk(body, boxEnd, depth + 1)
          else if (typ(p + 4, "mvhd") && timescale == 0L) {
            val v = if (body < end) u8(body) else -1
            if (v == 1 && body + 32 <= boxEnd) {
              timescale = be32(body + 20); duration = be64(body + 24)
            } else if (v == 0 && body + 20 <= boxEnd) {
              timescale = be32(body + 12); duration = be32(body + 16)
            }
          } else if (typ(p + 4, "tkhd") && width == 0 && height == 0) {
            val v = if (body < end) u8(body) else -1
            val off = if (v == 1) 88 else if (v == 0) 76 else -1
            if (off > 0 && body + off + 8 <= boxEnd) {
              width = (be32(body + off) >> 16).toInt        // 16.16 fixed
              height = (be32(body + off + 4) >> 16).toInt
            }
          }
          p = boxEnd
        }
      }
      walk(0, b.length, 0)
      if (timescale > 0L && duration >= 0L)
        Some((duration * 1000L / timescale, width, height))
      else None
    }
  }

  case class AssetVideoMeta(asset_id: Long, modality: String,
                            byte_len: Long,
                            video_format: Option[String],
                            duration_ms: Option[Long],
                            width: Option[Int],
                            height: Option[Int])

  /** Per-partition MP4 box-walk over video-shaped payloads — the video
    * twin of `extractAudioMeta`, REAL end-to-end (no stub): duration
    * from mvhd, dimensions from the first video tkhd. Non-MP4
    * payloads surface as nulls, never errors. */
  def extractVideoMeta(spark: SparkSession, assets: DataFrame): Dataset[AssetVideoMeta] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val meta = VideoCodec.mp4Meta(bytes)
          AssetVideoMeta(
            asset_id = id,
            modality = modality,
            byte_len = bytes.length.toLong,
            video_format = meta.map(_ => "mp4"),
            duration_ms = meta.map(_._1),
            width = meta.map(_._2),
            height = meta.map(_._3))
        }
      }
  }

  /** REAL pixel-level PNG decode in pure JVM: IDAT chunk concat →
    * zlib inflate (`java.util.zip.Inflater` ships in the JDK) →
    * per-scanline unfilter (the five filter types of RFC 2083 §6.3:
    * None/Sub/Up/Average/Paeth). Supports the 8-bit-depth,
    * non-interlaced color types (grayscale, gray+alpha, RGB, RGBA) —
    * the shapes a training-data pipeline actually stores. Verified
    * two independent ways: q91's oracle recomputes planted-gradient
    * pixel stats in closed form, and MultimodalSpec round-trips
    * random images through the JDK's own ImageIO PNG *encoder*
    * (adaptive filter choice, real deflate) and compares every
    * sample. Never throws — malformed bytes are data, not an error. */
  object PngCodec {
    /** Decoded 8-bit samples, row-major, `channels` per pixel. */
    case class Pixels(width: Int, height: Int, channels: Int, data: Array[Byte])

    def decode(b: Array[Byte]): Option[Pixels] = {
      if (b == null || b.length < 45) return None
      def u8(i: Int): Int = b(i) & 0xFF
      def be32(i: Int): Long =
        ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xFFFFFFFFL
      if (!(u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
            u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
            b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return None
      val width = be32(16)
      val height = be32(20)
      val bitDepth = u8(24)
      val colorType = u8(25)
      val interlace = u8(28)
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
        case _ => return None // palette (3) needs a PLTE lookup — out of scope
      }
      if (bitDepth != 8 || interlace != 0) return None
      // size guard: a hostile header must not allocate unbounded memory
      if (width <= 0 || height <= 0 || width * height * channels > (1L << 28))
        return None
      val w = width.toInt; val h = height.toInt
      val rowBytes = w * channels
      val stride = rowBytes + 1 // + filter-type byte

      // chunk walk: concatenate every IDAT payload (the zlib stream may
      // be split across chunks at arbitrary byte boundaries)
      val idat = new java.io.ByteArrayOutputStream()
      var p = 8
      var walking = true
      while (walking && p + 8 <= b.length) {
        val len = be32(p)
        // Long arithmetic: a crafted len near Int.MaxValue must not
        // wrap the bounds check negative and walk out of the buffer
        if (len > Int.MaxValue - 12 || p + 12L + len > b.length) walking = false
        else {
          if (b(p + 4) == 'I' && b(p + 5) == 'D' && b(p + 6) == 'A' && b(p + 7) == 'T')
            idat.write(b, p + 8, len.toInt)
          p += 12 + len.toInt // len + type(4) + crc(4)
        }
      }
      if (idat.size == 0) return None

      val raw = new Array[Byte](h * stride)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var got = 0
        while (got < raw.length && !inf.finished) {
          val k = inf.inflate(raw, got, raw.length - got)
          if (k == 0 && (inf.needsInput || inf.needsDictionary)) return None
          got += k
        }
        if (got < raw.length) return None
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()

      // per-scanline unfilter (RFC 2083 §6.3); predictors reference the
      // RECONSTRUCTED left/up/upper-left samples, bpp = channels at depth 8
      val out = new Array[Byte](h * rowBytes)
      var r = 0
      while (r < h) {
        val ft = raw(r * stride) & 0xFF
        if (ft > 4) return None
        val in = r * stride + 1
        val o = r * rowBytes
        var c = 0
        while (c < rowBytes) {
          val x = raw(in + c) & 0xFF
          val left = if (c >= channels) out(o + c - channels) & 0xFF else 0
          val up = if (r > 0) out(o - rowBytes + c) & 0xFF else 0
          val v = ft match {
            case 0 => x
            case 1 => x + left
            case 2 => x + up
            case 3 => x + ((left + up) >> 1)
            case 4 =>
              val ul = if (r > 0 && c >= channels) out(o - rowBytes + c - channels) & 0xFF else 0
              val pr = left + up - ul
              val pa = math.abs(pr - left); val pb = math.abs(pr - up); val pc = math.abs(pr - ul)
              x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          }
          out(o + c) = v.toByte
          c += 1
        }
        r += 1
      }
      Some(Pixels(w, h, channels, out))
    }

    /** Per-channel sample means over the decoded image. */
    def channelMeans(px: Pixels): Array[Double] = {
      val sums = new Array[Long](px.channels)
      var i = 0
      while (i < px.data.length) {
        sums(i % px.channels) += px.data(i) & 0xFF
        i += 1
      }
      val n = px.width.toLong * px.height
      sums.map(_.toDouble / n)
    }
  }

  /** ImageIO-backed pixel decode for the image containers the JDK
    * itself ships decoders for — standalone JPEG (the JDK carries a
    * full baseline+progressive DCT decoder), GIF, BMP. PNG goes
    * through the hand-rolled [[PngCodec]] first (oracle-exact and
    * covers the common shapes); this path catches what it declines
    * (palette PNG, 16-bit, interlaced) plus the lossy formats whose
    * pixel values aren't closed-form oracle-able but are still REAL
    * decodes (spec-verified against ImageIO's own encoders). Output
    * normalizes to 3-channel RGB. Never throws. */
  object ImageIoCodec {
    /** Header-probed, size-capped ImageIO decode: dimensions come
      * from the reader's HEADER parse before any pixel allocation —
      * a few-hundred-byte bomb declaring 60000×60000 must be
      * rejected up front, not after ImageIO allocates the ~14 GB
      * raster (an OutOfMemoryError no Exception handler catches). */
    private[operators] def readCapped(b: Array[Byte], off: Int,
                                      len: Int): Option[java.awt.image.BufferedImage] = {
      if (b == null || len < 8) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b, off, len))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0); val h = r.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h * 3 > (1L << 28)) return None
            Option(r.read(0))
          } finally r.dispose()
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    /** Bulk-raster RGB extraction (one getRGB call per image, not per
      * pixel — the per-pixel form re-enters ColorModel conversion per
      * sample). */
    private[operators] def toRgb(img: java.awt.image.BufferedImage): PngCodec.Pixels = {
      val w = img.getWidth; val h = img.getHeight
      val buf = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val rgb = buf(i)
        out(i * 3) = ((rgb >> 16) & 0xFF).toByte
        out(i * 3 + 1) = ((rgb >> 8) & 0xFF).toByte
        out(i * 3 + 2) = (rgb & 0xFF).toByte
        i += 1
      }
      PngCodec.Pixels(w, h, 3, out)
    }

    def decode(b: Array[Byte]): Option[PngCodec.Pixels] =
      if (b == null) None
      else readCapped(b, 0, b.length).map(toRgb)
  }

  case class AssetPixelStats(asset_id: Long, modality: String,
                             byte_len: Long,
                             is_png: Boolean,
                             width: Option[Int], height: Option[Int],
                             n_pixels: Option[Long],
                             channel_means: Option[Seq[Double]])

  /** Per-partition full PNG pixel decode → per-channel stats — the
    * image path REAL end-to-end from container bytes to samples (no
    * stub). Non-PNG payloads surface as nulls, never errors. */
  def extractPixelStats(spark: SparkSession, assets: DataFrame): Dataset[AssetPixelStats] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val px = PngCodec.decode(bytes)
          AssetPixelStats(
            asset_id = id,
            modality = modality,
            byte_len = bytes.length.toLong,
            is_png = px.isDefined,
            width = px.map(_.width),
            height = px.map(_.height),
            n_pixels = px.map(p => p.width.toLong * p.height),
            channel_means = px.map(p => PngCodec.channelMeans(p).toSeq))
        }
      }
  }

  case class AssetAudioStats(asset_id: Long, modality: String,
                             byte_len: Long,
                             is_wav: Boolean,
                             n_samples: Option[Long],
                             rms: Option[Double],
                             peak: Option[Int],
                             zero_crossings: Option[Long])

  /** REAL audio sample path: little-endian 16-bit PCM frames read
    * straight after the `data` chunk header `AudioCodec.wavMeta`
    * already locates — RMS / peak / zero-crossing stats per asset,
    * the audio twin of `extractPixelStats`. Mono 16-bit PCM only (the
    * planted-oracle shape); anything else surfaces as nulls. */
  object PcmCodec {
    /** Located mono-16-bit PCM stream: (data offset, sample count,
      * sample rate). The shared chunk walk under [[pcmStats]] and
      * [[dominantTone]]. */
    private[Multimodal] def pcmInfo(b: Array[Byte]): Option[(Int, Long, Int)] = {
      if (b == null || b.length < 44) return None
      def u8(i: Int): Int = b(i) & 0xFF
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
        return None
      // find the data chunk; require PCM (wFormatTag 1), MONO, 16-bit —
      // the documented contract: a stereo stream read as one channel
      // would report 2x the frames and bogus crossings, and a
      // compressed format declaring 16 bits would decode garbage
      var p = 12
      var tag = 0
      var channels = 0
      var bits = 0
      var rate = 0
      var dataOff = -1
      var dataLen = 0L
      while (p + 8 <= b.length && dataOff < 0) {
        val size = le32(p + 4)
        if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ') {
          if (size < 16 || p + 8 + 16 > b.length) return None
          tag = u8(p + 8) | (u8(p + 9) << 8)
          channels = u8(p + 10) | (u8(p + 11) << 8)
          rate = le32(p + 12).toInt
          bits = u8(p + 22) | (u8(p + 23) << 8)
          // WAVE_FORMAT_EXTENSIBLE wrapping plain PCM (what several
          // pro-audio writers emit): sub-format GUID's leading dword
          // at fmt+24 is 1 ⇒ treat as PCM
          if (tag == 0xFFFE && size >= 40 && p + 8 + 28 <= b.length &&
              le32(p + 8 + 24) == 1L) tag = 1
        } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' && b(p + 3) == 'a') {
          dataOff = p + 8
          dataLen = size
        }
        p += 8 + (size + (size & 1L)).min(Int.MaxValue).toInt
        if (p < 0) return None
      }
      if (dataOff < 0 || tag != 1 || channels != 1 || bits != 16 || rate <= 0)
        return None
      // clamp to what's actually present (byte-range probes truncate)
      val avail = math.min(dataLen, (b.length - dataOff).toLong)
      Some((dataOff, avail / 2, rate))
    }

    @inline private[Multimodal] def sample(b: Array[Byte], dataOff: Int, i: Long): Int =
      ((b(dataOff + (i * 2).toInt) & 0xFF) |
        (b(dataOff + (i * 2).toInt + 1) << 8)).toShort.toInt

    /** (n_samples, rms, peak, zero_crossings) over the int16 samples,
      * or None for non-WAV / non-16-bit / truncated payloads. A
      * crossing is a strict sign change (s_i·s_{i−1} < 0). */
    def pcmStats(b: Array[Byte]): Option[(Long, Double, Int, Long)] =
      pcmInfo(b).map { case (dataOff, n, _) =>
        if (n == 0) (0L, 0.0, 0, 0L)
        else {
          var sumSq = 0.0
          var peak = 0
          var crossings = 0L
          var prev = 0
          var i = 0L
          while (i < n) {
            val s = sample(b, dataOff, i)
            sumSq += s.toDouble * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > 0 && s.toLong * prev < 0) crossings += 1
            prev = s
            i += 1
          }
          (n, math.sqrt(sumSq / n), peak, crossings)
        }
      }

    /** Dominant tone via a Goertzel filter bank — the classic
      * single-bin DFT: per probe frequency f, run
      * s_i = x_i + 2cos(2πf/sr)·s_{i−1} − s_{i−2} over the samples
      * and read bin power s₁² + s₂² − 2cos(2πf/sr)·s₁·s₂. One pass
      * over the PCM stream whatever the bank size; no FFT library,
      * no O(N log N), and probes need not be FFT bins.
      *
      * Returns (n_samples, sample_rate, dominant probe frequency,
      * dominant bin power / Σ bank power). Ties break toward the
      * EARLIEST bank entry (the lower frequency, for the ascending
      * banks callers pass), deterministically. None when the payload
      * isn't mono-16-bit PCM, the stream is empty, or the bank is.
      * Probes at/above Nyquist are rejected loudly — a silently
      * aliased probe would report a fake dominant. */
    def dominantTone(b: Array[Byte], probeFreqs: Array[Double]): Option[(Long, Int, Double, Double)] =
      pcmInfo(b).flatMap { case (dataOff, n, rate) =>
        if (n == 0 || probeFreqs.isEmpty) None
        else {
          require(probeFreqs.forall(f => f > 0 && 2 * f < rate),
            s"probe bank must lie strictly inside (0, Nyquist=${rate / 2.0}) Hz")
          val k = probeFreqs.length
          val coef = Array.tabulate(k)(j => 2.0 * math.cos(2.0 * math.Pi * probeFreqs(j) / rate))
          val s1 = new Array[Double](k)
          val s2 = new Array[Double](k)
          var i = 0L
          while (i < n) {
            val x = sample(b, dataOff, i).toDouble
            var j = 0
            while (j < k) {
              val s0 = x + coef(j) * s1(j) - s2(j)
              s2(j) = s1(j)
              s1(j) = s0
              j += 1
            }
            i += 1
          }
          var best = 0
          var total = 0.0
          val power = Array.tabulate(k) { j =>
            val p = s1(j) * s1(j) + s2(j) * s2(j) - coef(j) * s1(j) * s2(j)
            total += p
            p
          }
          var j = 1
          while (j < k) { // strict > keeps the earliest-entry tie
            if (power(j) > power(best)) best = j
            j += 1
          }
          Some((n, rate, probeFreqs(best),
            if (total > 0) power(best) / total else 0.0))
        }
      }
  }

  /** Windowed dominant-bin sequence — the audio fingerprint core.
    * The stream is cut into consecutive FULL windows of
    * `windowSamples`; each window runs the same k Goertzel biquads as
    * [[PcmCodec.dominantTone]] and contributes the argmax bin INDEX
    * (strict >, earliest-entry tie — [[extractDominantTone]]'s rule).
    * A trailing partial window is dropped: its bin would depend on
    * how much tail happened to remain, which breaks the
    * same-content ⇒ same-fingerprint contract. The bin sequence is
    * GAIN-INVARIANT: scaling every sample by c scales every window's
    * power by c², leaving each argmax unchanged — so re-encoded
    * copies at different volume fingerprint identically (spec-pinned),
    * which is what makes this a perceptual fingerprint rather than a
    * byte hash. None when the payload isn't mono-16-bit PCM. */
  private[operators] def windowedBins(b: Array[Byte], probeFreqs: Array[Double],
                                      windowSamples: Int): Option[(Long, Int, Array[Int])] =
    PcmCodec.pcmInfo(b).map { case (dataOff, n, rate) =>
      require(windowSamples > 0, "windowSamples must be > 0")
      require(probeFreqs.nonEmpty &&
        probeFreqs.forall(f => f > 0 && 2 * f < rate),
        s"probe bank must lie strictly inside (0, Nyquist=${rate / 2.0}) Hz")
      val k = probeFreqs.length
      val coef = Array.tabulate(k)(j =>
        2.0 * math.cos(2.0 * math.Pi * probeFreqs(j) / rate))
      val nWin = (n / windowSamples).toInt
      val bins = new Array[Int](nWin)
      var w = 0
      while (w < nWin) {
        val s1 = new Array[Double](k)
        val s2 = new Array[Double](k)
        val base = w.toLong * windowSamples
        var i = 0
        while (i < windowSamples) {
          val x = PcmCodec.sample(b, dataOff, base + i).toDouble
          var j = 0
          while (j < k) {
            val s0 = x + coef(j) * s1(j) - s2(j)
            s2(j) = s1(j)
            s1(j) = s0
            j += 1
          }
          i += 1
        }
        var best = 0
        var j = 1
        while (j < k) {
          val p = s1(j) * s1(j) + s2(j) * s2(j) - coef(j) * s1(j) * s2(j)
          val pb = s1(best) * s1(best) + s2(best) * s2(best) -
            coef(best) * s1(best) * s2(best)
          if (p > pb) best = j
          j += 1
        }
        bins(w) = best
        w += 1
      }
      (n, rate, bins)
    }

  case class AssetAudioFp(asset_id: Long, modality: String,
                          is_wav: Boolean,
                          n_windows: Option[Int],
                          bins: Option[Seq[Int]],
                          fp: Option[String])

  /** Per-partition audio fingerprint extraction: the windowed
    * dominant-bin sequence plus its joined string form `fp`
    * ("3-1-4-1"), the content key near-dup audio matching groups on —
    * one scan, no shuffle, O(samples × bank) per asset. Downstream
    * matching is a plain groupBy on `fp` (bounded by content
    * duplication, the LSH-bucket shape), never pairwise audio
    * comparison. */
  def extractAudioFingerprint(spark: SparkSession, assets: DataFrame,
                              probeFreqs: Seq[Double],
                              windowSamples: Int): Dataset[AssetAudioFp] = {
    import spark.implicits._
    require(probeFreqs.nonEmpty, "empty probe bank")
    val bank = probeFreqs.toArray
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val r = windowedBins(bytes, bank, windowSamples)
          AssetAudioFp(
            asset_id = id,
            modality = modality,
            is_wav = r.isDefined,
            n_windows = r.map(_._3.length),
            bins = r.map(_._3.toSeq),
            fp = r.map(_._3.mkString("-")))
        }
      }
  }

  /** Per-partition PCM sample stats over audio payloads. */
  def extractAudioStats(spark: SparkSession, assets: DataFrame): Dataset[AssetAudioStats] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val st = PcmCodec.pcmStats(bytes)
          AssetAudioStats(
            asset_id = id,
            modality = modality,
            byte_len = bytes.length.toLong,
            is_wav = st.isDefined,
            n_samples = st.map(_._1),
            rms = st.map(_._2),
            peak = st.map(_._3),
            zero_crossings = st.map(_._4))
        }
      }
  }

  /** Perceptual image hashing for image near-dup pipelines: dHash
    * (difference hash) — grayscale, box-resize to a 9×8 grid, one bit
    * per horizontal neighbor comparison. Robust to re-encoding,
    * resizing and small edits; 64 bits, so the SimHash Hamming
    * machinery ([[Dedup.hammingPairs64]]) clusters image near-dups
    * with zero new shuffle shapes.
    *
    * All arithmetic is EXACT integer math (luma in 1/1000ths,
    * floor-div cell means) so an independent engine can replay the
    * hash from the same pixels — which is precisely what the q122
    * oracle does from the planted-pixel formula. */
  object ImageHash {
    private val GridW = 9
    private val GridH = 8

    /** Integer grayscale of pixel p: identity for gray(+alpha),
      * Rec.601 luma in integer thousandths for RGB(A). */
    @inline private def gray(px: PngCodec.Pixels, x: Int, y: Int): Long = {
      val o = (y * px.width + x) * px.channels
      if (px.channels <= 2) (px.data(o) & 0xFF).toLong * 1000L
      else 299L * (px.data(o) & 0xFF) + 587L * (px.data(o + 1) & 0xFF) +
        114L * (px.data(o + 2) & 0xFF)
    }

    /** dHash of decoded pixels, or None when the image is smaller
      * than the 9×8 grid (an upscale would hash interpolation
      * artifacts, not content). Bit (cy·8 + cx) is set iff
      * cell(cx, cy) < cell(cx+1, cy). */
    def dHash(px: PngCodec.Pixels): Option[Long] = {
      if (px.width < GridW || px.height < GridH) return None
      // box means over [floor(c·W/9), floor((c+1)·W/9)) — exact
      // integer cell bounds, floor-div means
      val cells = Array.ofDim[Long](GridH, GridW)
      var cy = 0
      while (cy < GridH) {
        val y0 = cy * px.height / GridH
        val y1 = (cy + 1) * px.height / GridH
        var cx = 0
        while (cx < GridW) {
          val x0 = cx * px.width / GridW
          val x1 = (cx + 1) * px.width / GridW
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += gray(px, x, y); x += 1 }
            y += 1
          }
          cells(cy)(cx) = sum / ((y1 - y0).toLong * (x1 - x0))
          cx += 1
        }
        cy += 1
      }
      var h = 0L
      cy = 0
      while (cy < GridH) {
        var cx = 0
        while (cx < GridW - 1) {
          if (cells(cy)(cx) < cells(cy)(cx + 1)) h |= 1L << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      Some(h)
    }

    /** Decode (hand-rolled PNG first, then ImageIO) and hash. */
    def dHashBytes(b: Array[Byte]): Option[Long] =
      PngCodec.decode(b).orElse(ImageIoCodec.decode(b)).flatMap(dHash)
  }

  case class AssetImageHash(asset_id: Long, modality: String,
                            is_image: Boolean,
                            width: Option[Int], height: Option[Int],
                            dhash: Option[Long])

  /** Per-partition perceptual-hash extraction — the front half of the
    * image near-dup pipeline (back half: [[Dedup.hammingPairs64]] on
    * the emitted signatures). */
  def extractImageHash(spark: SparkSession, assets: DataFrame): Dataset[AssetImageHash] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val px = PngCodec.decode(bytes).orElse(ImageIoCodec.decode(bytes))
          AssetImageHash(
            asset_id = id,
            modality = modality,
            is_image = px.isDefined,
            width = px.map(_.width),
            height = px.map(_.height),
            dhash = px.flatMap(ImageHash.dHash))
        }
      }
  }

  case class AssetTone(asset_id: Long, modality: String,
                       is_wav: Boolean,
                       n_samples: Option[Long],
                       sample_rate: Option[Int],
                       dominant_freq: Option[Double],
                       power_ratio: Option[Double])

  /** Per-partition Goertzel tone detection over audio payloads — the
    * frequency-domain sibling of [[extractAudioStats]] (time-domain
    * RMS/peak/crossings). The probe bank is fixed per call, so the
    * whole scan is one pass per asset with k running biquads; nothing
    * shuffles and nothing holds more than 2k doubles per row. */
  def extractDominantTone(spark: SparkSession, assets: DataFrame,
                          probeFreqs: Seq[Double]): Dataset[AssetTone] = {
    import spark.implicits._
    require(probeFreqs.nonEmpty, "empty probe bank")
    val bank = probeFreqs.toArray
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val tone = PcmCodec.dominantTone(bytes, bank)
          AssetTone(
            asset_id = id,
            modality = modality,
            is_wav = tone.isDefined,
            n_samples = tone.map(_._1),
            sample_rate = tone.map(_._2),
            dominant_freq = tone.map(_._3),
            power_ratio = tone.map(_._4))
        }
      }
  }

  /** Content-level byte features for payloads no pure-JVM codec
    * covers (e.g. H.264 video: entropy decode needs a codec library).
    * NOT a codec stand-in — an honest, deterministic content
    * descriptor (dim-sized byte-histogram moments) of the kind dedup
    * pipelines key on when pixel decode is unavailable. Payloads a
    * real codec CAN decode never reach this path (`extractFeatures`
    * prefers `PngCodec` channel stats). */
  object ByteFeatures {
    def histogram(payload: Array[Byte], dim: Int = 8): Array[Float] = {
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
  }

  /** REAL video frame path: AVI (RIFF) container walk to per-frame
    * pixel data, in pure JVM. Two in-scope frame codecs:
    *   - `..db` raw-DIB frames — uncompressed BGR24, bottom-up rows,
    *     stride padded to 4 bytes: exactly what
    *     `ffmpeg -c:v rawvideo -pix_fmt bgr24 out.avi` writes. A
    *     negative `biHeight` convention (top-down rows) is honored.
    *   - `..dc` MJPEG frames — each frame is a complete JPEG, decoded
    *     with the JDK's own `javax.imageio` (ships in the JDK; no
    *     external library).
    * Dimensions come from the `avih` MainAVIHeader (dwWidth/dwHeight
    * at offsets 32/36, little-endian); frames live in the `movi`
    * LIST, possibly nested inside `rec ` LISTs. Frames decode to RGB
    * top-down row-major, 3 bytes/pixel. Never throws — malformed
    * bytes are data, not an error. Verified two independent ways:
    * q94's oracle recomputes planted-gradient frame stats in closed
    * form, and MultimodalSpec round-trips random frames through an
    * independently-written test-side AVI muxer (and ImageIO's own
    * JPEG encoder for the MJPEG path). */
  object AviCodec {
    /** Decoded frames: RGB top-down row-major, 3 bytes per pixel.
      * `totalFrames` counts EVERY frame chunk in the container — the
      * count never truncates, however long the video. `frames` holds
      * only the DECODED ones (every `keepEvery`-th, up to the retained-
      * frames/bytes caps); `truncated` is true iff an eligible frame
      * was left undecoded because a cap was hit — the no-silent-caps
      * contract: a capped decode SAYS so. */
    case class Video(width: Int, height: Int, totalFrames: Int,
                     frames: Vector[Array[Byte]], truncated: Boolean = false)

    private val MaxFrames = 4096 // retained (decoded) frames per video
    private val MaxPixels = 1L << 26 // per frame: 64 Mpx * 3 B bounded below
    // cumulative decoded-bytes cap: per-frame caps alone let a ~64 MB
    // MJPEG payload of highly-compressed large frames amplify to
    // gigabytes of retained RGB inside one task
    private val MaxDecodedBytes = 1L << 28

    /** Decode every `keepEvery`-th frame (0, keepEvery, 2·keepEvery…);
      * skipped frames are COUNTED but never decoded, so sampling
      * callers pay only for kept frames. */
    def decode(b: Array[Byte], keepEvery: Int = 1): Option[Video] = {
      val frames = Vector.newBuilder[Array[Byte]]
      var kept = 0
      var decodedBytes = 0L
      scan(b, keepEvery) { fr =>
        frames += fr
        kept += 1
        decodedBytes += fr.length
        kept < MaxFrames && decodedBytes < MaxDecodedBytes
      }.flatMap { m =>
        val fs = frames.result()
        if (fs.isEmpty) None
        else Some(Video(m.width, m.height, m.totalFrames, fs, m.truncated))
      }
    }

    /** Per-channel (R,G,B) means over every `keepEvery`-th frame,
      * accumulated DURING the container walk: nothing is retained
      * beyond three longs and the current frame, so the feature-
      * extraction path never materializes a frame vector. Decode WORK
      * stays bounded by the same `MaxDecodedBytes` budget as
      * [[decode]] — these are untrusted payload bytes, and a few-MB
      * MJPEG of thousands of large compressed frames would otherwise
      * buy unbounded ImageIO CPU in one task. Means past the budget
      * cover the processed prefix (identical to the retained path's
      * coverage at the same budget). */
    def streamChannelMeans(b: Array[Byte], keepEvery: Int = 1): Option[Array[Double]] = {
      val sums = new Array[Long](3)
      var n = 0L
      var processed = 0L
      scan(b, keepEvery) { f =>
        var i = 0
        while (i < f.length) {
          sums(i % 3) += f(i) & 0xFF
          i += 1
        }
        n += f.length / 3
        processed += f.length
        processed < MaxDecodedBytes
      }.flatMap { _ =>
        if (n == 0) None else Some(sums.map(_.toDouble / n))
      }
    }

    private case class Meta(width: Int, height: Int, totalFrames: Int,
                            truncated: Boolean)

    /** Container walk shared by [[decode]] and [[streamChannelMeans]]:
      * parses headers, COUNTS every frame chunk, decodes each
      * `keepEvery`-th one and hands it to `onFrame`, which returns
      * whether to keep decoding (false ⇒ later eligible frames are
      * counted, flagged truncated, and never decoded). */
    private def scan(b: Array[Byte], keepEvery: Int)
                    (onFrame: Array[Byte] => Boolean): Option[Meta] = {
      val every = math.max(1, keepEvery)
      if (b == null || b.length < 24) return None
      def u8(i: Int): Int = b(i) & 0xFF
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
      def fourCC(i: Int, t: String): Boolean =
        b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)
      if (!(fourCC(0, "RIFF") && fourCC(8, "AVI "))) return None

      var width = 0
      var height = 0 // signed: negative ⇒ top-down row order
      var nFrames = 0 // every frame chunk seen, decoded or skipped
      var anyDecoded = false
      var decoding = true // false once onFrame asks to stop
      var truncated = false

      /** Decode one raw-DIB frame chunk to RGB top-down. */
      def dibFrame(off: Int, len: Int): Option[Array[Byte]] = {
        val w = width; val h = math.abs(height)
        if (w <= 0 || h == 0 || w.toLong * h > MaxPixels) return None
        val stride = (w * 3 + 3) & ~3
        if (len < stride * h) return None
        val out = new Array[Byte](w * h * 3)
        val topDown = height < 0
        var r = 0
        while (r < h) {
          val y = if (topDown) r else h - 1 - r // stored row r → image row y
          val in = off + r * stride
          val o = y * w * 3
          var x = 0
          while (x < w) {
            out(o + x * 3) = b(in + x * 3 + 2)     // R ← stored B,G,R order
            out(o + x * 3 + 1) = b(in + x * 3 + 1) // G
            out(o + x * 3 + 2) = b(in + x * 3)     // B
            x += 1
          }
          r += 1
        }
        Some(out)
      }

      /** Decode one MJPEG frame chunk via the JDK's ImageIO —
        * header-probed and size-capped ([[ImageIoCodec.readCapped]])
        * so a bomb frame is rejected before raster allocation. */
      def jpegFrame(off: Int, len: Int): Option[Array[Byte]] = {
        if (len < 4 || u8(off) != 0xFF || u8(off + 1) != 0xD8) return None
        ImageIoCodec.readCapped(b, off, len).flatMap { img =>
          val w = img.getWidth; val h = img.getHeight
          if (w.toLong * h > MaxPixels) None
          else {
            if (width == 0) { width = w; height = h }
            if (w != width || h != math.abs(height)) None
            else Some(ImageIoCodec.toRgb(img).data)
          }
        }
      }

      def isDigit(c: Byte): Boolean = c >= '0' && c <= '9'

      /** Walk `movi` content (frame chunks, possibly in `rec ` LISTs). */
      // depth-capped: real AVIs nest `rec ` one level; an adversarial
      // 100k-deep nest must exhaust the cap, not the JVM stack
      def walkMovi(start: Int, end: Int, depth: Int = 0): Unit = {
        if (depth > 16) return
        var p = start
        while (p + 8 <= end) { // counting never stops — only decoding caps
          val size = le32(p + 4)
          if (size > Int.MaxValue - 12 || p + 8 + size > end + 0L) return
          val len = size.toInt
          if (fourCC(p, "LIST") && len >= 4 && fourCC(p + 8, "rec "))
            walkMovi(p + 12, p + 8 + len, depth + 1)
          else if (isDigit(b(p)) && isDigit(b(p + 1)) &&
                   b(p + 2) == 'd' && (b(p + 3) == 'b' || b(p + 3) == 'c')) {
            if (nFrames % every == 0) {
              if (decoding) {
                val f = if (b(p + 3) == 'b') dibFrame(p + 8, len) else jpegFrame(p + 8, len)
                f.foreach { fr =>
                  anyDecoded = true
                  decoding = onFrame(fr)
                }
              } else truncated = true // eligible frame left undecoded
            }
            nFrames += 1
          }
          p += 8 + len + (len & 1) // chunks are word-aligned
        }
      }

      /** Walk `hdrl` content for the `avih` MainAVIHeader. */
      def walkHdrl(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val size = le32(p + 4)
          if (size > Int.MaxValue - 12 || p + 8 + size > end + 0L) return
          val len = size.toInt
          if (fourCC(p, "avih") && len >= 40) {
            width = le32(p + 8 + 32).toInt
            height = le32(p + 8 + 36).toInt
          }
          p += 8 + len + (len & 1)
        }
      }

      // top-level chunk walk inside the RIFF body
      var p = 12
      while (p + 8 <= b.length) {
        val size = le32(p + 4)
        if (size > Int.MaxValue - 12 || p + 8 + size > b.length) return None
        val len = size.toInt
        if (fourCC(p, "LIST") && len >= 4) {
          if (fourCC(p + 8, "hdrl")) walkHdrl(p + 12, p + 8 + len)
          else if (fourCC(p + 8, "movi")) walkMovi(p + 12, p + 8 + len)
        }
        p += 8 + len + (len & 1)
      }
      if (width <= 0 || height == 0 || !anyDecoded) None
      else Some(Meta(width, math.abs(height), nFrames, truncated))
    }

    /** Keep every `every`-th frame (0, every, 2·every, …) — real frame
      * sampling over decoded frames. */
    def sampleEvery(frames: Vector[Array[Byte]], every: Int): Vector[Array[Byte]] =
      frames.zipWithIndex.collect { case (f, i) if i % math.max(1, every) == 0 => f }

    /** Nearest-neighbor resize of one RGB frame: source index
      * sx = ⌊x·w/tw⌋, sy = ⌊y·h/th⌋ — deterministic, closed-form for
      * planted gradients (the oracle recomputes it in SQL). */
    def resizeNearest(frame: Array[Byte], w: Int, h: Int,
                      tw: Int, th: Int): Array[Byte] = {
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = y * h / th
        var x = 0
        while (x < tw) {
          val sx = x * w / tw
          val in = (sy * w + sx) * 3
          val o = (y * tw + x) * 3
          out(o) = frame(in); out(o + 1) = frame(in + 1); out(o + 2) = frame(in + 2)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Per-channel (R,G,B) sample means over a set of equal-size
      * RGB frames. */
    def channelMeans(frames: Seq[Array[Byte]]): Array[Double] = {
      val sums = new Array[Long](3)
      var n = 0L
      frames.foreach { f =>
        var i = 0
        while (i < f.length) {
          sums(i % 3) += f(i) & 0xFF
          i += 1
        }
        n += f.length / 3
      }
      if (n == 0) Array(0.0, 0.0, 0.0) else sums.map(_.toDouble / n)
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
          // real pixel features wherever a real decoder exists:
          // hand-rolled PNG first (oracle-exact), then the JDK's own
          // ImageIO decoders (JPEG/GIF/BMP + the PNG shapes PngCodec
          // declines), then AVI frame means; the byte-histogram
          // descriptor only for genuinely library-requiring codecs
          // (H.264, Vorbis, ...). Decoded features are ALWAYS 3
          // channels (gray replicated, alpha dropped) so consumers
          // never mix vector lengths within a kind; feature_kind
          // tells them which contract each row carries.
          def rgb3(means: Array[Double]): Array[Float] = {
            val m = means.length match {
              case 1 => Array(means(0), means(0), means(0))           // gray
              case 2 => Array(means(0), means(0), means(0))           // gray+alpha
              case _ => means.take(3)                                 // RGB(A)
            }
            m.map(v => (v / 255.0).toFloat)
          }
          // video means accumulate during the container walk
          // (streamChannelMeans) — feature extraction never holds a
          // frame vector, whatever the video length
          val (feature, featureKind) = PngCodec.decode(bytes)
            .orElse(ImageIoCodec.decode(bytes))
            .map(px => (rgb3(PngCodec.channelMeans(px)), "pixel_means"))
            .orElse(AviCodec.streamChannelMeans(bytes)
              .map(ms => (rgb3(ms), "frame_means")))
            .getOrElse((ByteFeatures.histogram(bytes), "byte_histogram"))
          AssetFeatures(
            asset_id = id,
            modality = modality,
            byte_len = bytes.length.toLong,
            content_hash = md.digest(bytes).map("%02x".format(_)).mkString,
            image_format = dims.map(_._1),
            width = dims.map(_._2),
            height = dims.map(_._3),
            feature = feature,
            feature_kind = featureKind)
        }
      }
  }

  /** REAL per-partition video frame pipeline: decode (AVI raw-DIB or
    * MJPEG via `AviCodec`) → keep every `every`-th frame → nearest-
    * neighbor resize to `targetW`×`targetH` → md5 per resized frame.
    * Non-video payloads surface as zero frames, never errors.
    * `n_frames` counts KEPT frames; `resized_len` is the per-frame
    * RGB byte size after resize (tw·th·3). */
  def resizeAndSample(spark: SparkSession, assets: DataFrame,
                      every: Int = 2, targetW: Int = 8,
                      targetH: Int = 8): Dataset[AssetFrames] = {
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          // keepEvery pushes the sampling INTO the walk: skipped
          // frames are counted, never decoded — kept-frames-only
          // decode cost and peak memory
          AviCodec.decode(payload, keepEvery = every) match {
            case Some(v) =>
              val kept = v.frames
                .map(AviCodec.resizeNearest(_, v.width, v.height, targetW, targetH))
              AssetFrames(id, kept.size, targetW * targetH * 3,
                kept.map(f => md.digest(f).map("%02x".format(_)).mkString))
            case None =>
              AssetFrames(id, 0, 0, Seq.empty)
          }
        }
      }
  }

  case class AssetFrameStats(asset_id: Long, modality: String,
                             byte_len: Long, is_video: Boolean,
                             width: Option[Int], height: Option[Int],
                             n_frames: Option[Int], n_kept: Option[Int],
                             mean_r: Option[Double], mean_g: Option[Double],
                             mean_b: Option[Double])

  /** Frame-level stats under the oracle: decode → sample every
    * `every`-th frame → nearest-neighbor resize → per-channel means
    * over the kept resized frames. The video twin of
    * `extractPixelStats` (image) / `extractAudioStats` (audio). */
  def extractFrameStats(spark: SparkSession, assets: DataFrame,
                        every: Int = 2, targetW: Int = 2,
                        targetH: Int = 2): Dataset[AssetFrameStats] = {
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          AviCodec.decode(bytes, keepEvery = every) match {
            case Some(v) =>
              val kept = v.frames
                .map(AviCodec.resizeNearest(_, v.width, v.height, targetW, targetH))
              val m = AviCodec.channelMeans(kept)
              AssetFrameStats(id, modality, bytes.length.toLong, is_video = true,
                Some(v.width), Some(v.height), Some(v.totalFrames),
                Some(kept.size), Some(m(0)), Some(m(1)), Some(m(2)))
            case None =>
              AssetFrameStats(id, modality, bytes.length.toLong, is_video = false,
                None, None, None, None, None, None, None)
          }
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
