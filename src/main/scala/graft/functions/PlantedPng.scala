package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Compiled mux for the q122-q124 planted test images: an 18×16
  * grayscale PNG (stored-deflate, filter-0 rows) whose pixel at
  * (x, y) is
  *
  *   (first-md5-byte("{seed}_{x}_{y}") + delta(variant)) mod 256
  *
  * — the exact formula the dHash oracles replay in SQL. The original
  * column-expression mux (transform/zip_with/aggregate over 304
  * bytes with a per-pixel md5 of a concat) ran INTERPRETED: ~288
  * expression-tree md5 evaluations per row put each of the three
  * image queries at ~12 s of the sf0.1 bench — the same
  * interpreted-HOF tax the sketch expressions header documents.
  * This expression computes byte-identical PNGs in a compiled loop.
  *
  * Byte-identity contract (pinned end-to-end by the q122-q124
  * oracles — a wrong zlib/crc byte fails PNG decode and drops rows, a
  * wrong pixel shifts the 64-bit hash): stored-deflate block, adler32
  * with one final mod (sums bounded: 304·255·305 < 2^63), CRC32 over
  * type+data, IHDR 8-bit grayscale.
  */
object PlantedPng {
  private val W = 18
  private val H = 16
  private val Stride = W + 1
  private val RawLen = H * Stride // 304

  private val md5 = ThreadLocal.withInitial { () =>
    java.security.MessageDigest.getInstance("MD5")
  }

  def grayPng(seed: Long, variant: Long): Array[Byte] = {
    val md = md5.get()
    val raw = new Array[Byte](RawLen)
    var y = 0
    while (y < H) {
      raw(y * Stride) = 0 // filter byte
      var x = 0
      while (x < W) {
        md.reset()
        val d = md.digest((seed.toString + "_" + x + "_" + y).getBytes("UTF-8"))
        val base = d(0) & 0xFF
        val delta = if (x == 0 && y % 2 == 0 && y / 2 < variant) 64 else 0
        raw(y * Stride + 1 + x) = ((base + delta) % 256).toByte
        x += 1
      }
      y += 1
    }
    // adler32, closed form with a single final mod (matches the mux)
    var sumB = 0L
    var sumW = 0L
    var i = 0
    while (i < RawLen) {
      val b = raw(i) & 0xFF
      sumB += b
      sumW += (RawLen - i).toLong * b
      i += 1
    }
    val s1 = (1L + sumB) % 65521
    val s2 = (RawLen + sumW) % 65521
    val adler = s2 * 65536 + s1

    val out = new java.io.ByteArrayOutputStream(RawLen + 80)
    def be32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xFF).toInt); out.write(((v >>> 16) & 0xFF).toInt)
      out.write(((v >>> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      be32(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be32(crc.getValue)
    }
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream(13)
    def ihdrBe32(v: Int): Unit = {
      ihdr.write((v >>> 24) & 0xFF); ihdr.write((v >>> 16) & 0xFF)
      ihdr.write((v >>> 8) & 0xFF); ihdr.write(v & 0xFF)
    }
    ihdrBe32(W); ihdrBe32(H)
    ihdr.write(8); ihdr.write(0); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val zlib = new java.io.ByteArrayOutputStream(RawLen + 11)
    zlib.write(0x78); zlib.write(0x01)
    zlib.write(0x01) // final stored block
    zlib.write(RawLen & 0xFF); zlib.write((RawLen >>> 8) & 0xFF)
    val nlen = 65535 - RawLen
    zlib.write(nlen & 0xFF); zlib.write((nlen >>> 8) & 0xFF)
    zlib.write(raw)
    zlib.write(((adler >>> 24) & 0xFF).toInt); zlib.write(((adler >>> 16) & 0xFF).toInt)
    zlib.write(((adler >>> 8) & 0xFF).toInt); zlib.write((adler & 0xFF).toInt)
    chunk("IDAT", zlib.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** (seed, variant) → planted PNG bytes. */
  def planted_gray_png(seed: Column, variant: Column): Column =
    Bridge.column(PlantedGrayPng(
      Bridge.expression(seed), Bridge.expression(variant)))

  /** Planted tone-sequence WAV (mono 16-bit PCM @ 8000 Hz): segment
    * j of `perSeg` samples carries freqs[j]; sample i is
    * round(amp·sin(2π·f·i/8000)) with Spark's own HALF_UP double
    * rounding (BigDecimal.valueOf) and the identical left-assoc float
    * order, so the bytes match the original column mux exactly
    * (MultimodalSpec-pinned). Same interpreted-HOF motivation as
    * [[grayPng]] — q121/q136 evaluated a sin+round expression tree
    * per sample per row. */
  def toneWav(freqs: org.apache.spark.sql.catalyst.util.ArrayData,
              amp: Double, perSeg: Int): Array[Byte] = {
    val nSeg = freqs.numElements()
    // null-propagate like the column mux this replaced: a null freq
    // element must yield NULL bytes, never a silent silence segment
    // (getDouble on a null slot would read 0.0)
    var j = 0
    while (j < nSeg) { if (freqs.isNullAt(j)) return null; j += 1 }
    val n = nSeg * perSeg
    val dataSize = 2 * n
    val out = new Array[Byte](44 + dataSize)
    def ascii(off: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + dataSize); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
    ascii(36, "data"); le32(40, dataSize)
    var i = 0
    while (i < n) {
      val f = freqs.getDouble(i / perSeg)
      val x = 2.0 * math.Pi * f * i.toDouble / 8000.0
      val v = java.math.BigDecimal.valueOf(amp * Math.sin(x))
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      val enc = (((v + 32768L) % 65536L) + 65536L) % 65536L
      out(44 + 2 * i) = (enc & 0xFF).toByte
      out(44 + 2 * i + 1) = ((enc >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** (freqs array<double>, amp double) → planted WAV bytes. */
  def planted_tone_wav(freqs: Column, amp: Column, perSeg: Int): Column =
    Bridge.column(PlantedToneWav(
      Bridge.expression(freqs), Bridge.expression(amp), perSeg))
}

case class PlantedGrayPng(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    PlantedPng.grayPng(seed.asInstanceOf[Long], variant.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = graft.functions.PlantedPng.grayPng($s, $v);")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PlantedGrayPng =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "planted_gray_png"
}

/** (freqs array<double>, amp double) → planted tone-sequence WAV via
  * [[PlantedPng.toneWav]]. `perSeg` is a structural literal. */
case class PlantedToneWav(left: Expression, right: Expression, perSeg: Int)
    extends BinaryExpression {
  require(perSeg > 0, "perSeg must be > 0")
  /** Nullable even over non-null children: a null freqs ELEMENT yields
    * NULL bytes ([[PlantedPng.toneWav]]'s null-propagation contract).
    * Without this override, non-null children put nullSafeCodeGen on
    * its non-nullable branch, which never declares `ev.isNull` — the
    * doGenCode below then references an undeclared variable, janino
    * rejects the generated class, and the whole stage silently falls
    * back to interpreted eval (the exact cost compiling this mux was
    * meant to remove). */
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, false) ||
      left.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, true)) {
      if (right.dataType == org.apache.spark.sql.types.DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName amp must be DOUBLE, got ${right.dataType.sql}")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName freqs must be ARRAY<DOUBLE>, got ${left.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(freqs: Any, amp: Any): Any =
    PlantedPng.toneWav(
      freqs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      amp.asInstanceOf[Double], perSeg)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, a) =>
      s"""${ev.value} = graft.functions.PlantedPng.toneWav($f, $a, $perSeg);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PlantedToneWav =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "planted_tone_wav"
}
