package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ext.Multimodal

/** Real container-header decode against hand-crafted PNG/JPEG/GIF/BMP
  * headers, plus the labeled fake fallback for unrecognized payloads.
  */
class ImageHeaderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def png(w: Int, h: Int, colorType: Int = 6): Array[Byte] = {
    val buf = ByteBuffer.allocate(33)
    buf.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes)
    buf.putInt(w).putInt(h)
    buf.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(0) // CRC placeholder
    buf.array()
  }

  private def jpeg(w: Int, h: Int, channels: Int = 3): Array[Byte] = {
    val buf = ByteBuffer.allocate(64)
    buf.put(0xFF.toByte).put(0xD8.toByte)                  // SOI
    buf.put(0xFF.toByte).put(0xE0.toByte).putShort(16)     // APP0, len 16
    buf.put(new Array[Byte](14))                           // APP0 payload
    buf.put(0xFF.toByte).put(0xC0.toByte).putShort(17)     // SOF0 baseline
    buf.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    buf.put(channels.toByte)
    buf.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](13)
    "GIF89a".getBytes.copyToArray(b)
    b(6) = (w & 0xFF).toByte; b(7) = ((w >> 8) & 0xFF).toByte
    b(8) = (h & 0xFF).toByte; b(9) = ((h >> 8) & 0xFF).toByte
    b
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.position(18)
    buf.putInt(w).putInt(h)
    buf.array()
  }

  test("decodes PNG IHDR dimensions and channels by color type") {
    assert(ImageHeaderMeta.decode(png(640, 480, colorType = 6)) ==
      Some((640, 480, 4, "png")))
    assert(ImageHeaderMeta.decode(png(1, 1, colorType = 0)) ==
      Some((1, 1, 1, "png")))
    assert(ImageHeaderMeta.decode(png(12000, 9000, colorType = 2)) ==
      Some((12000, 9000, 3, "png")))
  }

  test("decodes JPEG SOF0 after skipping APP segments") {
    assert(ImageHeaderMeta.decode(jpeg(800, 600)) == Some((800, 600, 3, "jpeg")))
    assert(ImageHeaderMeta.decode(jpeg(64, 32, channels = 1)) ==
      Some((64, 32, 1, "jpeg")))
  }

  test("decodes GIF and BMP headers") {
    assert(ImageHeaderMeta.decode(gif(320, 200)) == Some((320, 200, 3, "gif")))
    assert(ImageHeaderMeta.decode(bmp(1024, 768)) == Some((1024, 768, 3, "bmp")))
  }

  test("BMP top-down negative height is normalized") {
    val b = bmp(100, 0)
    val buf = ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(22); buf.putInt(-50)
    assert(ImageHeaderMeta.decode(b) == Some((100, 50, 3, "bmp")))
  }

  test("unrecognized or truncated content decodes to None") {
    assert(ImageHeaderMeta.decode("just some text".getBytes).isEmpty)
    assert(ImageHeaderMeta.decode(Array[Byte](0x89.toByte, 0x50)).isEmpty)
    assert(ImageHeaderMeta.decode(null).isEmpty)
    assert(ImageHeaderMeta.decode(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
  }

  test("the expression decodes per row inside a plan") {
    val df = Seq(
      (1L, png(640, 480)), (2L, jpeg(800, 600)), (3L, "nope".getBytes))
      .toDF("id", "content")
      .select(col("id"),
        GraftFunctions.imageHeaderMeta(col("content")).as("m"))
      .orderBy("id")
    val rows = df.selectExpr("id", "m.width", "m.height", "m.format").collect()
    assert(rows(0).getInt(1) == 640 && rows(0).getString(3) == "png")
    assert(rows(1).getInt(1) == 800 && rows(1).getString(3) == "jpeg")
    assert(rows(2).isNullAt(1))
  }

  test("decodeImageMeta uses real headers, labeled fake for the rest") {
    val df = Seq((1L, png(640, 480)), (2L, "plain text".getBytes))
      .toDF("asset_id", "content")
    val out = Multimodal.decodeImageMeta(df)
      .selectExpr("asset_id", "image_meta.width", "image_meta.format")
      .orderBy("asset_id").collect()
    assert(out(0).getInt(1) == 640 && out(0).getString(2) == "png")
    assert(out(1).getString(2) == "fake") // honest stub, labeled as such
  }

  test("decodes WAV RIFF headers: rate, channels, bits, duration") {
    // 8000 Hz, mono, 16-bit, 16000 data bytes → byteRate 16000 → 1000 ms
    val wav = {
      val buf = ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + 16000).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16)
      buf.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      buf.put("data".getBytes).putInt(16000)
      buf.array()
    }
    assert(AudioHeaderMeta.decode(wav) == Some((8000, 1, 16, 1000L)))
    assert(AudioHeaderMeta.decode("not audio".getBytes).isEmpty)
    assert(AudioHeaderMeta.decode(null).isEmpty)
  }

  test("WAV chunk walk honors RIFF word alignment for odd-sized chunks") {
    // an odd-length LIST chunk (7 bytes + 1 pad) precedes fmt/data — the
    // walk must advance by size + pad or it misreads the fmt boundary
    val wav = {
      val buf = ByteBuffer.allocate(60).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
      buf.put("LIST".getBytes).putInt(7).put("INFOxyz".getBytes).put(0.toByte)
      buf.put("fmt ".getBytes).putInt(16)
      buf.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      buf.put("data".getBytes).putInt(32000)
      buf.array()
    }
    assert(AudioHeaderMeta.decode(wav) == Some((8000, 1, 16, 2000L)))
  }

  test("syntheticWavContent round-trips through the real audio decoder") {
    val out = Seq((44100, 2, 16, 176400)).toDF("sr", "ch", "bits", "ds")
      .select(Multimodal.syntheticWavContent(
        col("sr"), col("ch"), col("bits"), col("ds")).as("c"))
      .select(GraftFunctions.audioHeaderMeta(col("c")).as("m"))
      .selectExpr("m.sample_rate", "m.channels", "m.bits", "m.duration_ms", "m.format")
      .head()
    assert(out.getInt(0) == 44100 && out.getInt(1) == 2 && out.getInt(2) == 16)
    assert(out.getLong(3) == 1000L) // 176400 bytes / (44100*2*2 B/s) = 1 s
    assert(out.getString(4) == "wav")
  }

  test("syntheticPngContent round-trips through the real decoder") {
    val out = Seq((123, 456)).toDF("w", "h")
      .select(Multimodal.syntheticPngContent(col("w"), col("h")).as("c"))
      .select(GraftFunctions.imageHeaderMeta(col("c")).as("m"))
      .selectExpr("m.width", "m.height", "m.channels", "m.format")
      .head()
    assert(out.getInt(0) == 123 && out.getInt(1) == 456)
    assert(out.getInt(2) == 4 && out.getString(3) == "png")
  }
}
