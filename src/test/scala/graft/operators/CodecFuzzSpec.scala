package graft.operators

import graft.SparkSpecBase

/** Adversarial-bytes contract for every pure-JVM codec: at 100 TB the
  * payload column is untrusted — truncated uploads, bit rot, hostile
  * headers — and a single throw inside a mapPartitions batch kills
  * the whole task (and with it the stage, after retries). Every
  * codec must treat malformed bytes as data (None), never as an
  * exception. This spec throws seeded garbage, truncations of VALID
  * payloads at every prefix length, and single-bit corruptions of
  * valid payloads at all five codecs. */
class CodecFuzzSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(20260813L)

  private def decodeAll(b: Array[Byte]): Unit = {
    Multimodal.ImageCodec.imageDims(b)
    Multimodal.AudioCodec.wavMeta(b)
    Multimodal.VideoCodec.mp4Meta(b)
    Multimodal.PngCodec.decode(b)
    Multimodal.PcmCodec.pcmStats(b)
    Multimodal.AviCodec.decode(b)
    Multimodal.ImageIoCodec.decode(b)
  }

  /** A valid payload per container family, built with JDK/test-side
    * encoders (not the codecs under test). */
  private def validPayloads: Seq[Array[Byte]] = {
    // PNG via ImageIO's own encoder
    val img = new java.awt.image.BufferedImage(9, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 9)
      img.setRGB(x, y, rnd.nextInt(1 << 24))
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    // WAV: RIFF header + 16-bit PCM samples, ByteBuffer-built
    val n = 40
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + 2 * n); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(2 * n)
    (0 until n).foreach(_ => bb.putShort(rnd.nextInt(65536).toShort))
    // AVI: reuse the independent muxer shape inline (4x3, 2 frames)
    val stride = (4 * 3 + 3) & ~3
    def leInt(v: Int) = { val b = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN); b.putInt(v); b.array() }
    val dib = Array.fill(stride * 3)(rnd.nextInt(256).toByte)
    val avih = leInt(33333) ++ leInt(0) ++ leInt(0) ++ leInt(0) ++
      leInt(2) ++ leInt(0) ++ leInt(1) ++ leInt(0) ++
      leInt(4) ++ leInt(3) ++ Array.fill(16)(0.toByte)
    val hdrl = "hdrl".getBytes ++ "avih".getBytes ++ leInt(avih.length) ++ avih
    val movi = "movi".getBytes ++
      ("00db".getBytes ++ leInt(dib.length) ++ dib) ++
      ("00db".getBytes ++ leInt(dib.length) ++ dib)
    val body = "AVI ".getBytes ++
      "LIST".getBytes ++ leInt(hdrl.length) ++ hdrl ++
      "LIST".getBytes ++ leInt(movi.length) ++ movi
    val avi = "RIFF".getBytes ++ leInt(body.length) ++ body
    Seq(png.toByteArray, bb.array(), avi)
  }

  test("random garbage never throws in any codec") {
    for (_ <- 1 to 300) {
      val len = rnd.nextInt(300)
      decodeAll(Array.fill(len)(rnd.nextInt(256).toByte))
    }
    decodeAll(null)
    decodeAll(Array.empty[Byte])
  }

  test("every truncation prefix of a valid payload never throws") {
    validPayloads.foreach { full =>
      (0 to full.length).foreach(k => decodeAll(full.take(k)))
    }
  }

  test("single-bit corruptions of valid payloads never throw") {
    validPayloads.foreach { full =>
      for (_ <- 1 to 400) {
        val mutated = full.clone()
        val i = rnd.nextInt(mutated.length)
        mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
        decodeAll(mutated)
      }
    }
  }

  test("PNG chunk length near Int.MaxValue cannot wrap the bounds check") {
    // valid signature + IHDR claiming 4x4 gray, then a chunk whose
    // length field is 0x7FFFFFE0: p + 12 + len overflows Int — the
    // walk must stop, not read out of bounds
    val hdr = ("89504E470D0A1A0A" + "0000000D49484452" +
      "00000004" + "00000004" + "0800000000" + "00000000").replaceAll(" ", "")
    val evil = hdr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray ++
      Array[Byte](0x7F, 0xFF.toByte, 0xFF.toByte, 0xE0.toByte) ++
      "IDAT".getBytes ++ Array.fill(16)(0.toByte)
    assert(Multimodal.PngCodec.decode(evil).isEmpty) // and must not throw
  }

  test("deeply nested rec-LIST AVIs exhaust the depth cap, not the JVM stack") {
    def leInt(v: Int) = { val b = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN); b.putInt(v); b.array() }
    val depth = 100000
    // build the nest in ONE pass (a foldLeft of array concats is
    // O(depth²) — ~60 GB of cumulative copying): level i from the
    // outside wraps 12·(depth−1−i) + 4 inner bytes
    val nested = new Array[Byte](12 * depth)
    for (i <- 0 until depth) {
      System.arraycopy("LIST".getBytes, 0, nested, i * 12, 4)
      System.arraycopy(leInt(4 + 12 * (depth - 1 - i)), 0, nested, i * 12 + 4, 4)
      System.arraycopy("rec ".getBytes, 0, nested, i * 12 + 8, 4)
    }
    val avih = leInt(33333) ++ leInt(0) ++ leInt(0) ++ leInt(0) ++
      leInt(1) ++ leInt(0) ++ leInt(1) ++ leInt(0) ++
      leInt(4) ++ leInt(2) ++ Array.fill(16)(0.toByte)
    val hdrl = "hdrl".getBytes ++ "avih".getBytes ++ leInt(avih.length) ++ avih
    val movi = "movi".getBytes ++ nested
    val body = "AVI ".getBytes ++
      "LIST".getBytes ++ leInt(hdrl.length) ++ hdrl ++
      "LIST".getBytes ++ leInt(movi.length) ++ movi
    val avi = "RIFF".getBytes ++ leInt(body.length) ++ body
    // no frames and, critically, no StackOverflowError
    assert(Multimodal.AviCodec.decode(avi).isEmpty)
  }

  test("decompression-bomb headers are rejected before raster allocation") {
    // 58-byte BMP claiming 60000x60000 (a ~14 GB raster if decoded):
    // the header probe must reject it without allocating
    val w = 60000; val h = 60000
    val bb = java.nio.ByteBuffer.allocate(58)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte)
    bb.putInt(58); bb.putInt(0); bb.putInt(54)       // size, reserved, data offset
    bb.putInt(40); bb.putInt(w); bb.putInt(h)        // BITMAPINFOHEADER
    bb.putShort(1); bb.putShort(24); bb.putInt(0)    // planes, bpp, compression
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    val before = Runtime.getRuntime.totalMemory()
    assert(Multimodal.ImageIoCodec.decode(bb.array()).isEmpty)
    // no multi-GB allocation happened (heap growth far under raster size)
    val grown = Runtime.getRuntime.totalMemory() - before
    assert(grown < (1L << 30), s"suspicious allocation during bomb probe: $grown")
  }

  test("PcmCodec accepts WAVE_FORMAT_EXTENSIBLE wrapping plain PCM") {
    val n = 8
    val bb = java.nio.ByteBuffer.allocate(68 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(60 + 2 * n); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(40)
    bb.putShort(0xFFFE.toShort); bb.putShort(1)      // EXTENSIBLE, mono
    bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
    bb.putShort(22); bb.putShort(16)                 // cbSize, validBits
    bb.putInt(1)                                     // channel mask
    bb.putInt(1); bb.putShort(0); bb.putShort(0x10)  // PCM sub-format GUID head
    bb.put(Array[Byte](0x80.toByte, 0, 0, 0xAA.toByte, 0, 0x38, 0x9B.toByte, 0x71))
    bb.put("data".getBytes); bb.putInt(2 * n)
    (0 until n).foreach(i => bb.putShort((i * 100).toShort))
    val st = Multimodal.PcmCodec.pcmStats(bb.array())
    assert(st.isDefined, "EXTENSIBLE+PCM-GUID mono must decode")
    assert(st.get._1 === n)
  }

  test("PcmCodec rejects stereo and non-PCM formats per its mono contract") {
    def wav(tag: Int, channels: Int): Array[Byte] = {
      val n = 8
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + 2 * n); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(tag.toShort); bb.putShort(channels.toShort)
      bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(2 * n)
      (0 until n).foreach(i => bb.putShort((if (i % 2 == 0) 100 else -100).toShort))
      bb.array()
    }
    assert(Multimodal.PcmCodec.pcmStats(wav(tag = 1, channels = 1)).isDefined)
    assert(Multimodal.PcmCodec.pcmStats(wav(tag = 1, channels = 2)).isEmpty,
      "stereo must be rejected, not decoded as one interleaved stream")
    assert(Multimodal.PcmCodec.pcmStats(wav(tag = 3, channels = 1)).isEmpty,
      "non-PCM format tags must be rejected")
  }

  test("magic-bytes-only payloads (header claims, no body) never throw") {
    val magics = Seq(
      "89504E470D0A1A0A", // PNG signature alone
      "52494646FFFFFFFF57415645", // RIFF/WAVE with max size claim
      "52494646FFFFFFFF41564920", // RIFF/AVI with max size claim
      "0000002066747970", // MP4 ftyp box header
      "FFD8FFC0", "474946383961")
    magics.foreach(m => decodeAll(
      m.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray))
  }
}
