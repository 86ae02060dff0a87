package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header decode for binary image payloads: parses real
  * PNG / JPEG / GIF / BMP headers (pure JVM byte reading — no codec
  * libraries) into `struct<width int, height int, channels int,
  * format string>`; NULL for unrecognized content, so callers can fall
  * back or filter. Runs per row inside the scan — no UDF ser/de, no
  * driver involvement, and only the first ~few hundred bytes of each
  * payload are touched.
  */
case class ImageHeaderMeta(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ImageHeaderMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_header_meta"

  def compute(bytes: Array[Byte]): InternalRow =
    ImageHeaderMeta.decode(bytes) match {
      case Some((w, h, c, fmt)) =>
        InternalRow(w, h, c, UTF8String.fromString(fmt))
      case None => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imghdr", this, classOf[ImageHeaderMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageHeaderMeta {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** (width, height, channels, format) or None if not a recognized
    * container. */
  def decode(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (b == null) None
    else if (isPng(b)) decodePng(b)
    else if (isJpeg(b)) decodeJpeg(b)
    else if (isGif(b)) decodeGif(b)
    else if (isBmp(b)) decodeBmp(b)
    else None
  }

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 26 && b.take(8).sameElements(PngSig)

  /** PNG: 8-byte signature, then the IHDR chunk (length + "IHDR" +
    * 4-byte BE width at offset 16, height at 20, bit depth, color type).
    */
  private def decodePng(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) None
    else {
      val w = be32(b, 16); val h = be32(b, 20)
      val colorType = u8(b, 25)
      val channels = colorType match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => 3
      }
      if (w <= 0 || h <= 0) None else Some((w, h, channels, "png"))
    }
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8

  /** JPEG: walk the marker segments to the first SOFn (start-of-frame:
    * 0xC0-0xCF except the DHT/JPG/DAC markers 0xC4/0xC8/0xCC), which
    * carries height, width, and component count.
    */
  private def decodeJpeg(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xFF) return None // lost sync
      var marker = u8(b, i + 1)
      // skip fill bytes
      while (marker == 0xFF && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) }
      if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        val h = be16(b, i + 5); val w = be16(b, i + 7)
        val channels = u8(b, i + 9)
        return if (w > 0 && h > 0) Some((w, h, channels, "jpeg")) else None
      }
      if (marker == 0xD8 || marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        i += 2 // standalone marker, no length field
      } else {
        if (i + 3 >= b.length) return None
        i += 2 + be16(b, i + 2)
      }
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def decodeGif(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    val w = le16(b, 6); val h = le16(b, 8)
    if (w > 0 && h > 0) Some((w, h, 3, "gif")) else None
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  private def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    val w = le32(b, 18); val h = math.abs(le32(b, 22)) // height may be negative (top-down)
    if (w > 0 && h > 0) Some((w, h, 3, "bmp")) else None
  }
}

/** WAV (RIFF) header decode for binary audio payloads:
  * `struct<sample_rate int, channels int, bits int, duration_ms bigint,
  * format string>`, NULL for unrecognized content. Header-only — walks
  * the RIFF chunk list to `fmt ` and `data`, never touches samples.
  */
case class AudioHeaderMeta(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = AudioHeaderMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_header_meta"

  def compute(bytes: Array[Byte]): InternalRow =
    AudioHeaderMeta.decode(bytes) match {
      case Some((sr, ch, bits, durMs)) =>
        InternalRow(sr, ch, bits, durMs, UTF8String.fromString("wav"))
      case None => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("audiohdr", this, classOf[AudioHeaderMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioHeaderMeta {

  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** (sampleRate, channels, bitsPerSample, durationMs). */
  def decode(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 36 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return None
    var sampleRate = 0; var channels = 0; var bits = 0
    var byteRate = 0L; var dataSize = -1L
    var i = 12
    // chunk walk: id(4) + size(LE32) + payload; header fields only
    while (i + 8 <= b.length && (sampleRate == 0 || dataSize < 0)) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ") && i + 24 <= b.length) {
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
        bits = if (i + 24 <= b.length) le16(b, i + 22) else 0
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      // RIFF chunks are word-aligned: odd-sized chunks carry a pad byte
      // that is not counted in `size` (e.g. LIST/INFO metadata chunks)
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (sampleRate <= 0 || channels <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some((sampleRate, channels, bits, dataSize * 1000L / byteRate))
  }
}
