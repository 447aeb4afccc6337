package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromText(
    Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")

  test("asset contract: binary payload + typed metadata struct") {
    val row = assets.filter($"asset_id" === 0L).head()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(row.getAs[String]("modality") === "text")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Long]("duration_ms") > 0)
  }

  test("extractFeatures: per-partition decode, hash matches SQL md5, deterministic") {
    val feats = Multimodal.extractFeatures(spark, assets)
    assert(feats.count() === assets.count())
    // content hash from the partition-side codec equals codegen md5()
    val joined = feats.toDF().join(
      Multimodal.payloadStats(assets)
        .select($"asset_id", $"content_hash".as("sql_hash"), $"byte_len".as("sql_len")),
      "asset_id")
    assert(joined.filter($"content_hash" =!= $"sql_hash").count() === 0)
    assert(joined.filter($"byte_len" =!= $"sql_len").count() === 0)
    // deterministic across runs
    val a = feats.orderBy("asset_id").collect().map(_.feature.toSeq)
    val b = Multimodal.extractFeatures(spark, assets)
      .orderBy("asset_id").collect().map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.head.length === 8)
  }

  test("resizeAndSample: bounded output, stride frame selection") {
    val frames = Multimodal.resizeAndSample(spark, assets,
      targetBytes = 128, frameSize = 32, every = 2)
    val rows = frames.collect()
    assert(rows.length === assets.count())
    // resize bound holds for every asset
    assert(rows.forall(_.resized_len <= 128))
    // 128 bytes / 32-byte frames = 4 chunks, every 2nd kept → 2 frames
    assert(rows.filter(_.resized_len == 128).forall(_.n_frames == 2))
    assert(rows.forall(r => r.frame_hashes.length == r.n_frames))
  }

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("ImageCodec parses PNG/GIF dimensions from container headers") {
    // PNG 640x480: signature + IHDR with BE dims
    val png = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 0806000000")
    assert(Multimodal.ImageCodec.imageDims(png) === Some(("png", 640, 480)))
    // GIF89a 320x200: LE dims in the logical screen descriptor
    val gif = "GIF89a".getBytes("ASCII") ++ hexBytes("4001 C800 F70000")
    assert(Multimodal.ImageCodec.imageDims(gif) === Some(("gif", 320, 200)))
  }

  test("ImageCodec walks JPEG markers past APP/quant segments to SOF") {
    // SOI + APP0(len 16) + DQT(len 4) + SOF0 with 100x50 dims
    val jpeg = hexBytes(
      "FFD8" + "FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
        "FFDB 0004 0000" + "FFC0 000B 08 0032 0064 01 011100")
    assert(Multimodal.ImageCodec.imageDims(jpeg) === Some(("jpeg", 100, 50)))
  }

  test("ImageCodec returns None for non-image, truncated, and scan-only payloads") {
    assert(Multimodal.ImageCodec.imageDims(null).isEmpty)
    assert(Multimodal.ImageCodec.imageDims("plain text".getBytes).isEmpty)
    // PNG signature but truncated before IHDR dims
    assert(Multimodal.ImageCodec.imageDims(
      hexBytes("89504E470D0A1A0A 0000000D 4948")).isEmpty)
    // JPEG that hits start-of-scan without any SOF
    assert(Multimodal.ImageCodec.imageDims(
      hexBytes("FFD8 FFDA 0002 0000")).isEmpty)
  }

  test("extractFeatures surfaces parsed dims; text payloads stay None") {
    val feats = Multimodal.extractFeatures(spark, assets).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.image_format.isEmpty &&
      f.width.isEmpty && f.height.isEmpty))
  }

  test("short payloads pass through resize untouched") {
    val tiny = Multimodal.assetsFromText(
      Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text")
    val r = Multimodal.resizeAndSample(spark, tiny, targetBytes = 128,
      frameSize = 32, every = 2).head()
    assert(r.resized_len === 3)
    assert(r.n_frames === 1)
  }

  // 8 kHz mono 16-bit PCM declaring 16000 sample bytes → 1000 ms
  private val wavMono8k = hexBytes(
    "52494646 A43E0000 57415645" +        // RIFF(36+16000) WAVE
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 803E0000")                // data(16000), no sample bytes

  test("AudioCodec parses the WAV fmt/data chunks (LE fields, floor-div duration)") {
    assert(Multimodal.AudioCodec.wavMeta(wavMono8k) === Some((8000, 1, 16, 1000L)))
    // 44100 Hz stereo: byteRate 176400, 44100 data bytes → 250 ms
    val stereo = hexBytes(
      "52494646 00000000 57415645" +
        "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
        "64617461 44AC0000")
    assert(Multimodal.AudioCodec.wavMeta(stereo) === Some((44100, 2, 16, 250L)))
  }

  test("AudioCodec walks past odd-sized non-fmt chunks (word-aligned pad byte)") {
    // LIST chunk of declared size 5 → occupies 6 bytes before fmt
    val withList = hexBytes(
      "52494646 00000000 57415645" +
        "4C495354 05000000 494E464F 41 00" + // "LIST"(5): INFO A + pad
        "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        "64617461 803E0000")
    assert(Multimodal.AudioCodec.wavMeta(withList) === Some((8000, 1, 16, 1000L)))
  }

  test("AudioCodec returns None for non-WAV, truncated, and fmt-less payloads") {
    assert(Multimodal.AudioCodec.wavMeta(null).isEmpty)
    assert(Multimodal.AudioCodec.wavMeta("plain text bytes".getBytes).isEmpty)
    // RIFF/WAVE magic but truncated before any chunk completes
    assert(Multimodal.AudioCodec.wavMeta(
      hexBytes("52494646 00000000 57415645 666D7420")).isEmpty)
    // data chunk but no fmt → no byteRate to derive duration from
    assert(Multimodal.AudioCodec.wavMeta(
      hexBytes("52494646 00000000 57415645 64617461 04000000 00000000")).isEmpty)
  }

  test("extractAudioMeta: WAV payloads decode, non-audio rows surface nulls") {
    val rows = Seq(
      (1L, "audio", wavMono8k),
      (2L, "text", "not a riff container".getBytes)
    ).toDF("asset_id", "modality", "payload")
    val out = Multimodal.extractAudioMeta(spark, rows).collect()
      .map(m => m.asset_id -> m).toMap
    assert(out(1L).audio_format === Some("wav"))
    assert(out(1L).sample_rate === Some(8000))
    assert(out(1L).channels === Some(1))
    assert(out(1L).bits_per_sample === Some(16))
    assert(out(1L).duration_ms === Some(1000L))
    assert(out(1L).byte_len === wavMono8k.length.toLong)
    assert(out(2L).audio_format.isEmpty && out(2L).sample_rate.isEmpty &&
      out(2L).duration_ms.isEmpty)
  }

  // --- VideoCodec (MP4 / ISO-BMFF) ---

  /** Minimal valid MP4: ftyp + moov[mvhd(v0) + trak[tkhd(v0)]].
    * timescale 1000, duration 2500 → 2500 ms; 320×240. */
  private val mp4v0 = hexBytes(
    "00000010 66747970 69736F6D 00000000" + // ftyp "isom"
      "000000D8 6D6F6F76" +                 // moov (216)
      "0000006C 6D766864 00000000 00000000 00000000" + // mvhd v0
      "000003E8 000009C4" +                 // timescale 1000, duration 2500
      "00010000 0100" + "00" * 10 +         // rate, volume, reserved
      "00010000 00000000 00000000 00000000 00010000 00000000" +
      "00000000 00000000 40000000" +        // unity matrix
      "00" * 24 + "00000002" +              // predefined + next_track_ID
      "00000064 7472616B" +                 // trak (100)
      "0000005C 746B6864 00000007 00000000 00000000" + // tkhd v0
      "00000001 00000000 000009C4" +        // track 1, reserved, duration
      "00" * 16 +                           // reserved+layer+alt+vol+reserved
      "00010000 00000000 00000000 00000000 00010000 00000000" +
      "00000000 00000000 40000000" +        // unity matrix
      "01400000 00F00000")                  // 320.0 x 240.0 as 16.16

  test("VideoCodec walks ftyp/moov/mvhd/tkhd and derives duration + 16.16 dims") {
    assert(Multimodal.VideoCodec.mp4Meta(mp4v0) === Some((2500L, 320, 240)))
  }

  test("VideoCodec handles v1 mvhd (64-bit duration) and skips audio tkhd (0x0)") {
    // moov[mvhd(v1: ts 600, dur 1234567) + trak[tkhd audio 0x0] + trak[tkhd 64x32]]
    val mvhdV1 =
      "00000078 6D766864 01000000" +                 // mvhd v1 (120 bytes)
        "0000000000000000 0000000000000000" +        // creation/mod (64-bit)
        "00000258 000000000012D687" +                // ts 600, dur 1234567 (64-bit)
        "00010000 0100" + "00" * 10 + "00" * 36 + "00" * 24 + "00000002"
    def tkhdV0(wh: String) =
      "0000005C 746B6864 00000007 00000000 00000000" +
        "00000001 00000000 00000000" + "00" * 16 + "00" * 36 + wh
    val moovBody = mvhdV1 +
      "00000064 7472616B" + tkhdV0("00000000 00000000") + // audio track: 0x0
      "00000064 7472616B" + tkhdV0("00400000 00200000")   // video: 64x32
    val bytes = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        "00000148 6D6F6F76" + moovBody)                   // moov = 8+120+100+100 = 328
    // 1234567 * 1000 / 600 = 2057611 (floor)
    assert(Multimodal.VideoCodec.mp4Meta(bytes) === Some((2057611L, 64, 32)))
  }

  test("VideoCodec returns None for non-MP4, truncated, and corrupt-size payloads") {
    assert(Multimodal.VideoCodec.mp4Meta(null).isEmpty)
    assert(Multimodal.VideoCodec.mp4Meta("just some text bytes".getBytes).isEmpty)
    assert(Multimodal.VideoCodec.mp4Meta(wavMono8k).isEmpty) // wrong container
    // valid ftyp but moov truncated mid-mvhd
    assert(Multimodal.VideoCodec.mp4Meta(mp4v0.take(40)).isEmpty)
    // a child box whose declared size escapes its parent: walk stops clean
    val corrupt = mp4v0.clone()
    corrupt(16 + 8) = 0x7F.toByte // mvhd size hi-byte → escapes moov
    assert(Multimodal.VideoCodec.mp4Meta(corrupt).isEmpty)
  }

  // PngCodec ground truth: round-trip through the JDK's OWN PNG
  // encoder (javax.imageio) — an independent implementation with real
  // deflate compression and the encoder's adaptive per-row filter
  // choice (exercising Sub/Up/Average/Paeth unfiltering, which the
  // q91 planted payloads only partially cover). Every sample of every
  // image must reconstruct exactly.
  test("PngCodec decodes ImageIO-encoded images sample-exactly (gray, RGB, RGBA)") {
    import java.awt.image.BufferedImage
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      (BufferedImage.TYPE_BYTE_GRAY, 1, 37, 23),
      (BufferedImage.TYPE_3BYTE_BGR, 3, 64, 48),
      (BufferedImage.TYPE_4BYTE_ABGR, 4, 31, 17))
    for ((imgType, channels, w, h) <- cases) {
      val img = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) {
        val a = if (channels == 4) rnd.nextInt(256) else 255
        val rgb = (a << 24) | (rnd.nextInt(256) << 16) | (rnd.nextInt(256) << 8) | rnd.nextInt(256)
        img.setRGB(x, y, rgb)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val px = Multimodal.PngCodec.decode(bos.toByteArray)
        .getOrElse(fail(s"decode failed for type $imgType"))
      assert((px.width, px.height, px.channels) === ((w, h, channels)))
      // compare against the RASTER samples (band order = PNG sample
      // order: gray / RGB / RGBA), not getRGB — getRGB round-trips
      // TYPE_BYTE_GRAY through a colorspace conversion
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val expected = (0 until channels).map(b => raster.getSample(x, y, b))
        val off = (y * w + x) * channels
        val got = (0 until channels).map(i => px.data(off + i) & 0xFF)
        assert(got === expected, s"pixel ($x,$y) type $imgType")
      }
    }
  }

  test("PngCodec returns None for non-PNG, truncated, and unsupported payloads") {
    assert(Multimodal.PngCodec.decode(null).isEmpty)
    assert(Multimodal.PngCodec.decode("plain text, no signature".getBytes).isEmpty)
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val full = bos.toByteArray
    assert(Multimodal.PngCodec.decode(full).isDefined)
    // truncated mid-IDAT: the inflate can't fill the raster → None, no throw
    assert(Multimodal.PngCodec.decode(full.take(full.length - 20)).isEmpty)
    // hostile header: 2^24 × 2^24 dims must not allocate
    val hostile = full.clone()
    hostile(16) = 0x7F.toByte // width hi byte
    assert(Multimodal.PngCodec.decode(hostile).isEmpty)
  }

  test("PcmCodec: RMS/peak/zero-crossings over a hand-built PCM stream") {
    // mono 16-bit WAV, 4 samples: +100, -200, +300, 0
    def le16(v: Int) = Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val samples = Seq(100, -200, 300, 0)
    val data = samples.flatMap(le16)
    val wav = ("RIFF".getBytes.toSeq ++ le32(36 + data.size) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.size) ++ data).toArray
    val Some((n, rms, peak, zc)) = Multimodal.PcmCodec.pcmStats(wav)
    assert(n === 4L)
    assert(peak === 300)
    assert(zc === 2L) // +100→-200 and -200→+300; →0 is not a strict crossing
    val expectedRms = math.sqrt((100.0 * 100 + 200 * 200 + 300 * 300 + 0) / 4)
    assert(math.abs(rms - expectedRms) < 1e-12)
    // truncated data: stats over what's present (byte-range probe shape)
    val Some((n2, _, _, _)) = Multimodal.PcmCodec.pcmStats(wav.take(wav.length - 4))
    assert(n2 === 2L)
    assert(Multimodal.PcmCodec.pcmStats("not riff at all".getBytes).isEmpty)
  }

  test("extractVideoMeta: MP4 payloads decode, non-video rows surface nulls") {
    val rows = Seq(
      (1L, "video", mp4v0),
      (2L, "text", "not an iso-bmff container".getBytes)
    ).toDF("asset_id", "modality", "payload")
    val out = Multimodal.extractVideoMeta(spark, rows).collect()
      .map(m => m.asset_id -> m).toMap
    assert(out(1L).video_format === Some("mp4"))
    assert(out(1L).duration_ms === Some(2500L))
    assert(out(1L).width === Some(320))
    assert(out(1L).height === Some(240))
    assert(out(1L).byte_len === mp4v0.length.toLong)
    assert(out(2L).video_format.isEmpty && out(2L).duration_ms.isEmpty)
  }
}
