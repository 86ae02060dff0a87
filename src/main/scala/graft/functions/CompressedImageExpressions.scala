package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL pixel decode for the COMPRESSED image containers (PNG deflate,
  * JPEG DCT, GIF LZW) via `javax.imageio` — part of every JDK, so no
  * external codec binding is needed after all; this removes the last
  * labeled image stub from [[graft.ext.Multimodal]] (MP3/video remain
  * stubbed: the JDK ships no codec for them). Reference behavior: the
  * image feature-extraction step of a multimodal training pipeline
  * (decode → per-channel statistics), kept scan-local — decode runs
  * inside the task against the payload bytes, no UDF ser/de, no driver
  * involvement, memory bounded by one decoded image per row at a time.
  *
  * Expressions keep the repo's reference-object codegen (not
  * `CodegenFallback`, which would demote the whole containing stage to
  * interpreted eval).
  */
object CompressedImageExpressions {
  // never spill decode scratch to disk-backed cache files on executors
  ImageIO.setUseCache(false)

  val statsSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Decode any ImageIO-supported payload (PNG/JPEG/GIF/BMP/WBMP) to
    * (w, h, pixels, meanR, meanG, meanB); None when the bytes are not a
    * decodable image (decline, never guess). */
  def decode(b: Array[Byte]): Option[(Int, Int, Long, Double, Double, Double)] = {
    if (b == null || b.length < 8) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(b))
      catch { case scala.util.control.NonFatal(_) => return None }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    // row-buffered ARGB walk: one w-length int row at a time, so the
    // scratch is O(width), not O(pixels)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >>> 16) & 0xFF; sg += (p >>> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some((w, h, n, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** 64-bit difference hash (dHash) of any ImageIO-decodable payload:
    * nearest-neighbor resample to a 9×8 integer-luminance grid, then
    * bit `y*8+x` = lum(x,y) < lum(x+1,y). Near-duplicate images (crops,
    * re-encodes, small edits) land within a few bits of hamming
    * distance — the image analogue of text simhash, feeding the same
    * pigeonhole-banded near-dup join. Every step is integer arithmetic
    * on our own resample (no Graphics2D scaler), so the hash is
    * deterministic across JVMs for lossless formats. */
  def dhash(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 8) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(b))
      catch { case scala.util.control.NonFatal(_) => return None }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    // 9×8 luminance grid by nearest-neighbor index mapping
    val lum = Array.ofDim[Int](8, 9)
    var gy = 0
    while (gy < 8) {
      val sy = math.min(h - 1, gy * h / 8)
      var gx = 0
      while (gx < 9) {
        val sx = math.min(w - 1, gx * w / 9)
        val p = img.getRGB(sx, sy)
        // integer ITU-R 601 luma — deterministic, no float rounding
        lum(gy)(gx) = (((p >>> 16) & 0xFF) * 299 + ((p >>> 8) & 0xFF) * 587 +
          (p & 0xFF) * 114) / 1000
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(y)(x) < lum(y)(x + 1)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    Some(hash)
  }

  /** Encode a constant-color image of the packed `(width, height, r, g,
    * b)` struct in `format` ("png" | "jpg" | "gif" | "bmp") — the
    * deterministic planted payload the decode oracle predicts exactly
    * (lossless formats) or within a quantization band (JPEG). */
  def encodeConst(format: String, w: Int, h: Int,
      r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no ImageIO writer for '$format'")
    out.toByteArray
  }
}

/** `image_pixel_stats(content)` — per-channel pixel statistics of any
  * ImageIO-decodable payload; NULL for undecodable bytes. */
case class ImagePixelStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CompressedImageExpressions.statsSchema
  override def nullable: Boolean = true
  override def prettyName: String = "image_pixel_stats"

  def compute(bytes: Array[Byte]): InternalRow =
    CompressedImageExpressions.decode(bytes) match {
      case Some((w, h, n, r, g, b)) => InternalRow(w, h, n, r, g, b)
      case None => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imgpix", this, classOf[ImagePixelStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_dhash(content)` — 64-bit perceptual difference hash of any
  * ImageIO-decodable payload; NULL for undecodable bytes. Feed to the
  * pigeonhole-banded hamming join ([[graft.ext.Dedup
  * .hammingNearDuplicates]]) for image near-dup detection. */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  def compute(bytes: Array[Byte]): Any =
    CompressedImageExpressions.dhash(bytes) match {
      case Some(h) => h
      case None    => null
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imgdh", this, classOf[ImageDHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object r$$ = $ref.compute($c);
      |${ev.isNull} = r$$ == null;
      |if (!${ev.isNull}) ${ev.value} = ((Long) r$$).longValue();
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_encode_const(format, struct(w, h, r, g, b))` — constant-color
  * image payload in a real compressed container, for planted decode
  * oracles and pipeline tests. `format` is a constructor constant so
  * the writer lookup happens once, not per row. */
case class ImageConstEncode(format: String, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "image_encode_const"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 5 &&
        s.fields.forall(_.dataType == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected struct<int,int,int,int,int> (w,h,r,g,b), got ${other.sql}")
  }

  def compute(row: InternalRow): Array[Byte] =
    CompressedImageExpressions.encodeConst(format,
      row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4))

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imgenc", this, classOf[ImageConstEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
