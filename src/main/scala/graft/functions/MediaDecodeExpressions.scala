package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL full-content decode for the uncompressed media containers that
  * need no codec library — the step beyond the header expressions
  * ([[ImageHeaderMeta]]/[[AudioHeaderMeta]]): BI_RGB BMP pixel
  * statistics and PCM WAV sample statistics, each a single scan-local
  * pass over the payload bytes (no UDF ser/de, no driver involvement).
  * Compressed formats (PNG's deflate, JPEG's DCT, MP3, video codecs)
  * genuinely need a codec binding and keep the documented stub
  * ([[graft.ext.Multimodal]]) — what this file removes is the stub
  * label from the formats where "decode" is pure byte arithmetic.
  */
case class BmpPixelStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpPixelStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_pixel_stats"

  def compute(bytes: Array[Byte]): InternalRow =
    BmpPixelStats.decode(bytes) match {
      case Some((w, h, n, r, g, b)) => InternalRow(w, h, n, r, g, b)
      case None => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bmppix", this, classOf[BmpPixelStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BmpPixelStats {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** (width, height, pixels, meanR, meanG, meanB) for an uncompressed
    * (BI_RGB) 24- or 32-bit BMP; None for anything else (compressed
    * BMPs, palettes, truncated payloads — decline, never guess).
    * Negative header height = top-down row order; irrelevant to the
    * order-insensitive statistics, but the magnitude is the row count.
    * Row stride is padded to 4 bytes; 32-bit pixels are BGRA (alpha
    * ignored), 24-bit are BGR. */
  def decode(b: Array[Byte]): Option[(Int, Int, Long, Double, Double, Double)] = {
    if (b == null || b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte)
      return None
    val pixelOffset = le32(b, 10)
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val height = math.abs(rawHeight)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (compression != 0 || (bpp != 24 && bpp != 32)) return None
    if (width <= 0 || height <= 0 || pixelOffset < 54) return None
    val bytesPerPixel = bpp / 8
    val stride = ((width * bytesPerPixel) + 3) & ~3
    val need = pixelOffset.toLong + stride.toLong * height
    if (need > b.length) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var row = 0
    while (row < height) {
      var i = pixelOffset + row * stride
      var colIdx = 0
      while (colIdx < width) {
        sb += u8(b, i); sg += u8(b, i + 1); sr += u8(b, i + 2)
        i += bytesPerPixel
        colIdx += 1
      }
      row += 1
    }
    val n = width.toLong * height
    Some((width, height, n, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }
}

case class WavPcmStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavPcmStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "wav_pcm_stats"

  def compute(bytes: Array[Byte]): InternalRow =
    WavPcmStats.decode(bytes) match {
      case Some((n, rms, peak)) => InternalRow(n, rms, peak)
      case None => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavpcm", this, classOf[WavPcmStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcmStats {

  val schema: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** (sampleCount, rms, peak) over a PCM WAV's data chunk — amplitudes
    * normalized to [-1, 1] (16-bit: /32768; 8-bit: unsigned, -128 then
    * /128). Multi-channel samples count individually (rms/peak over the
    * interleaved stream). None for non-WAV, non-PCM (format tag != 1),
    * or unsupported widths. */
  def decode(b: Array[Byte]): Option[(Long, Double, Double)] = {
    val (dataOff, end, bits) = pcmLayout(b).getOrElse(return None)
    val bytesPer = bits / 8
    val n = (end - dataOff) / bytesPer
    if (n <= 0) return None
    var sumSq = 0.0; var peak = 0.0
    var p = dataOff
    var k = 0
    while (k < n) {
      val v =
        if (bits == 16) (le16(b, p).toShort).toDouble / 32768.0
        else (u8(b, p) - 128).toDouble / 128.0
      sumSq += v * v
      val a = math.abs(v)
      if (a > peak) peak = a
      p += bytesPer
      k += 1
    }
    Some((n.toLong, math.sqrt(sumSq / n), peak))
  }

  /** The RIFF chunk walk shared by stats and the energy hash:
    * (dataOffset, dataEnd, bitsPerSample) of a PCM 8/16-bit WAV. */
  private[functions] def pcmLayout(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b == null || b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return None
    var bits = 0; var fmtTag = -1
    var dataOff = -1; var dataLen = 0L
    // Long cursor + unsigned size arithmetic: a crafted chunk size with
    // the top bit set would otherwise step the Int cursor BACKWARDS
    // (negative-index read) or loop — the walk must always advance ≥ 8
    var i = 12L
    while (i + 8 <= b.length && (fmtTag < 0 || dataOff < 0)) {
      val ii = i.toInt
      val size = le32(b, ii + 4) // unsigned 32-bit, ≥ 0
      if (tag(b, ii, "fmt ") && i + 24 <= b.length) {
        fmtTag = le16(b, ii + 8)
        bits = le16(b, ii + 22)
      } else if (tag(b, ii, "data")) {
        dataOff = ii + 8
        dataLen = size
      }
      i += 8L + size + (size & 1L)
    }
    if (fmtTag != 1 || dataOff < 0 || (bits != 8 && bits != 16)) None
    else Some((dataOff, math.min(b.length.toLong, dataOff + dataLen).toInt, bits))
  }

  /** 64-bit energy-envelope fingerprint (the audio analogue of image
    * dHash): the PCM stream splits into 65 equal frames, each frame's
    * energy is the INTEGER sum of absolute sample amplitudes, and bit
    * `i` = energy(i) < energy(i+1). Re-encodes at a different bit depth
    * or amplitude scale keep the envelope's SHAPE, so near-duplicate
    * clips land a few hamming bits apart — feed to
    * [[graft.ext.Dedup.hammingNearDuplicates]]. None for non-PCM
    * payloads or clips shorter than 65 samples (no envelope to hash). */
  def energyHash(b: Array[Byte]): Option[Long] = {
    val (dataOff, end, bits) = pcmLayout(b).getOrElse(return None)
    val bytesPer = bits / 8
    val n = (end - dataOff) / bytesPer
    if (n < 65) return None
    val energy = new Array[Long](65)
    var f = 0
    while (f < 65) {
      val from = f * n / 65
      val until = (f + 1) * n / 65
      var k = from
      var e = 0L
      while (k < until) {
        val p = dataOff + k * bytesPer
        e += (if (bits == 16) math.abs(le16(b, p).toShort.toInt)
              else math.abs(u8(b, p) - 128))
        k += 1
      }
      energy(f) = e
      f += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (energy(i) < energy(i + 1)) hash |= 1L << i
      i += 1
    }
    Some(hash)
  }
}

/** `audio_energy_hash(content)` — 64-bit energy-envelope fingerprint of
  * a PCM WAV; NULL for non-PCM payloads or sub-65-sample clips. */
case class AudioEnergyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_energy_hash"

  def compute(bytes: Array[Byte]): Any =
    WavPcmStats.energyHash(bytes) match {
      case Some(h) => h
      case None    => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("audioeh", this, classOf[AudioEnergyHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object r$$ = $ref.compute($c);
      |${ev.isNull} = r$$ == null;
      |if (!${ev.isNull}) ${ev.value} = ((Long) r$$).longValue();
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MPEG audio (MP3) FRAME-HEADER walk — codec-free, real: frame sync +
  * header fields are plain byte arithmetic (ISO 11172-3 §2.4.1.3), so
  * frame count, sample rate, average bitrate, and exact play duration
  * come from a single scan-local pass with no decoder. Only PCM
  * synthesis (the Huffman/IMDCT stage) needs a codec library and stays
  * behind the documented stub ([[graft.ext.Multimodal]]) — this
  * expression removes the stub label from MP3 METADATA, the part a
  * data pipeline filters and audits on (duration caps, bitrate floors,
  * corrupt-frame detection). Handles a leading ID3v2 tag (syncsafe
  * size) and VBR streams (per-frame bitrate summed into the average).
  * NULL for payloads with no valid MPEG-1 Layer III frame. */
case class Mp3FrameStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp3FrameStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "mp3_frame_stats"

  def compute(bytes: Array[Byte]): InternalRow =
    Mp3FrameStats.decode(bytes) match {
      case Some((frames, sr, avgKbps, durSec)) =>
        InternalRow(frames, sr, avgKbps, durSec)
      case None => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mp3fs", this, classOf[Mp3FrameStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp3FrameStats {

  val schema: StructType = StructType(Seq(
    StructField("frames", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("avg_bitrate_kbps", DoubleType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = false)))

  /** MPEG-1 Layer III bitrate table (kbps); index 0 = "free" and 15 =
    * invalid — both end the walk. */
  private val Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRates = Array(44100, 48000, 32000)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** (frames, sampleRate, avgBitrateKbps, durationSec). The walk stops
    * at the first byte that is not a valid frame header (truncated tail
    * frames count only if complete). Sample rate is the FIRST frame's —
    * real streams never mix rates; a rate change ends the walk. */
  def decode(b: Array[Byte]): Option[(Int, Int, Double, Double)] = {
    if (b == null || b.length < 4) return None
    var i = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4), then the tag body
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
      i = 10 + size
      if (i < 0 || i >= b.length) return None // crafted size overflow
    }
    var frames = 0
    var sampleRate = 0
    var kbpsSum = 0.0
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xFF || (u8(b, i + 1) & 0xE0) != 0xE0)
        return done(frames, sampleRate, kbpsSum)
      val versionBits = (u8(b, i + 1) >> 3) & 3 // 3 = MPEG-1
      val layerBits = (u8(b, i + 1) >> 1) & 3   // 1 = Layer III
      if (versionBits != 3 || layerBits != 1)
        return done(frames, sampleRate, kbpsSum)
      val bitrateIdx = (u8(b, i + 2) >> 4) & 15
      val srIdx = (u8(b, i + 2) >> 2) & 3
      val padding = (u8(b, i + 2) >> 1) & 1
      if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3)
        return done(frames, sampleRate, kbpsSum)
      val sr = SampleRates(srIdx)
      if (sampleRate == 0) sampleRate = sr
      else if (sr != sampleRate) return done(frames, sampleRate, kbpsSum)
      val kbps = Bitrates(bitrateIdx)
      val frameLen = 144000 * kbps / sr + padding
      if (frameLen < 4 || i + frameLen > b.length)
        return done(frames, sampleRate, kbpsSum)
      frames += 1
      kbpsSum += kbps
      i += frameLen
    }
    done(frames, sampleRate, kbpsSum)
  }

  private def done(frames: Int, sr: Int,
      kbpsSum: Double): Option[(Int, Int, Double, Double)] =
    if (frames == 0) None
    else Some((frames, sr, kbpsSum / frames, frames * 1152.0 / sr))
}
