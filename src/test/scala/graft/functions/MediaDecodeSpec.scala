package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Full-content decode of the codec-free containers: BI_RGB BMP pixel
  * statistics (24- and 32-bit, padded strides, top-down heights) and
  * PCM WAV sample statistics (16- and 8-bit), against hand-packed
  * byte buffers with known ground truth. Unrecognized/compressed
  * payloads must decline (NULL), never guess.
  */
class MediaDecodeSpec extends AnyFunSuite {

  private def le(out: ByteArrayOutputStream, v: Long, bytes: Int): Unit =
    (0 until bytes).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))

  /** Hand-packed BMP: explicit pixels (row-major, top row first in the
    * ARGUMENT; written bottom-up like a positive-height BMP). */
  private def bmp(width: Int, height: Int, bpp: Int,
      pixels: Seq[(Int, Int, Int)], topDown: Boolean = false): Array[Byte] = {
    val bytesPer = bpp / 8
    val stride = ((width * bytesPer) + 3) & ~3
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    le(out, 54L + stride * height, 4); le(out, 0, 4); le(out, 54, 4)
    le(out, 40, 4); le(out, width, 4)
    le(out, if (topDown) -height else height, 4)
    le(out, 1, 2); le(out, bpp, 2); le(out, 0, 4); le(out, stride * height, 4)
    le(out, 0, 4); le(out, 0, 4); le(out, 0, 4); le(out, 0, 4)
    val rows = pixels.grouped(width).toSeq
    val ordered = if (topDown) rows else rows.reverse
    ordered.foreach { row =>
      row.foreach { case (r, g, b) =>
        out.write(b); out.write(g); out.write(r)
        if (bytesPer == 4) out.write(0xAA) // alpha byte, must be ignored
      }
      (0 until stride - width * bytesPer).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  private def wav(bits: Int, samples: Seq[Int]): Array[Byte] = {
    val bytesPer = bits / 8
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes); le(out, 36L + samples.size * bytesPer, 4)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le(out, 16, 4)
    le(out, 1, 2); le(out, 1, 2); le(out, 16000, 4)
    le(out, 16000L * bytesPer, 4); le(out, bytesPer, 2); le(out, bits, 2)
    out.write("data".getBytes); le(out, samples.size * bytesPer, 4)
    samples.foreach(s => le(out, s.toLong & (if (bits == 16) 0xFFFF else 0xFF), bytesPer))
    out.toByteArray
  }

  test("24-bit BMP with stride padding: exact means over explicit pixels") {
    // 3x2, stride 12 (9 data + 3 pad) — padding must not enter the sums
    val px = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255),
      (10, 20, 30), (40, 50, 60), (70, 80, 90))
    val got = BmpPixelStats.decode(bmp(3, 2, 24, px)).get
    assert(got._1 == 3 && got._2 == 2 && got._3 == 6L)
    assert(got._4 == px.map(_._1).sum / 6.0)
    assert(got._5 == px.map(_._2).sum / 6.0)
    assert(got._6 == px.map(_._3).sum / 6.0)
  }

  test("32-bit BMP ignores alpha; top-down height decodes identically") {
    val px = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12))
    val a = BmpPixelStats.decode(bmp(2, 2, 32, px)).get
    val b = BmpPixelStats.decode(bmp(2, 2, 32, px, topDown = true)).get
    assert(a == b)
    assert(a._4 == (1 + 4 + 7 + 10) / 4.0)
  }

  test("compressed/palette/truncated BMPs decline") {
    val ok = bmp(2, 2, 24, Seq.fill(4)((9, 9, 9)))
    assert(BmpPixelStats.decode(ok).isDefined)
    val rle = ok.clone(); rle(30) = 1 // BI_RLE8 compression tag
    assert(BmpPixelStats.decode(rle).isEmpty)
    assert(BmpPixelStats.decode(ok.take(53)).isEmpty)   // truncated header
    assert(BmpPixelStats.decode(ok.take(60)).isEmpty)   // truncated pixels
    val pal = ok.clone(); pal(28) = 8 // 8-bit palette bmp: needs color table
    assert(BmpPixelStats.decode(pal).isEmpty)
    assert(BmpPixelStats.decode(null).isEmpty)
  }

  test("16-bit PCM: rms/peak over signed samples, exact on powers of two") {
    val got = WavPcmStats.decode(wav(16, Seq(16384, -16384, 16384, -16384))).get
    assert(got._1 == 4L)
    assert(got._2 == 0.5 && got._3 == 0.5) // |±2^14|/2^15 exactly
    val silent = WavPcmStats.decode(wav(16, Seq(0, 0))).get
    assert(silent._2 == 0.0 && silent._3 == 0.0)
  }

  test("8-bit PCM is unsigned around 128; non-PCM declines") {
    val got = WavPcmStats.decode(wav(8, Seq(255, 1, 128, 128))).get
    assert(got._1 == 4L)
    assert(got._3 == 127.0 / 128.0) // peak from the 255 sample
    val nonPcm = wav(16, Seq(1, 2)).clone()
    nonPcm(20) = 3 // fmt tag = IEEE float
    assert(WavPcmStats.decode(nonPcm).isEmpty)
  }

  test("compressed decode: PNG/GIF round-trip constant color exactly") {
    for (fmt <- Seq("png", "gif", "bmp")) {
      val bytes = CompressedImageExpressions.encodeConst(fmt, 7, 5, 10, 200, 31)
      val (w, h, n, r, g, b) = CompressedImageExpressions.decode(bytes).get
      assert((w, h, n) == (7, 5, 35L), fmt)
      assert((r, g, b) == (10.0, 200.0, 31.0), s"$fmt lossless round-trip")
    }
  }

  test("compressed decode: JPEG dims exact, constant color within band") {
    val bytes = CompressedImageExpressions.encodeConst("jpg", 16, 8, 60, 120, 180)
    val (w, h, n, r, g, b) = CompressedImageExpressions.decode(bytes).get
    assert((w, h, n) == (16, 8, 128L))
    // constant color = pure DC coefficient; only YCbCr rounding moves it
    assert(math.abs(r - 60) <= 3 && math.abs(g - 120) <= 3 &&
      math.abs(b - 180) <= 3, s"jpeg drift r=$r g=$g b=$b")
  }

  test("compressed decode declines garbage, empty, and truncated bytes") {
    assert(CompressedImageExpressions.decode(null).isEmpty)
    assert(CompressedImageExpressions.decode(Array.emptyByteArray).isEmpty)
    assert(CompressedImageExpressions.decode("not an image at all".getBytes).isEmpty)
    val png = CompressedImageExpressions.encodeConst("png", 20, 20, 1, 2, 3)
    assert(CompressedImageExpressions.decode(png.take(30)).isEmpty)
  }

  test("image_pixel_stats expression end to end over a DataFrame") {
    val spark = graft.SharedSpark.spark
    import org.apache.spark.sql.functions._
    val df = spark.range(5).select(
      col("id"),
      graft.functions.GraftFunctions.imageEncodeConst("png",
        (lit(3) + col("id")).cast("int"), lit(4),
        col("id").cast("int"), (col("id") * 2).cast("int"),
        (col("id") * 3).cast("int")).as("content"))
    val got = df.select(col("id"),
        graft.functions.GraftFunctions.imagePixelStats(col("content")).as("px"))
      .select(col("id"), col("px.width"), col("px.mean_r"), col("px.mean_g"))
      .orderBy("id").collect()
    got.zipWithIndex.foreach { case (row, i) =>
      assert(row.getInt(1) == 3 + i)
      assert(row.getDouble(2) == i.toDouble && row.getDouble(3) == 2.0 * i)
    }
  }

  // hand-packed MP4: ftyp + moov(mvhd v0/v1 + trak/tkhd) — ground truth
  // independent of the column-expression generator
  private def be(out: ByteArrayOutputStream, v: Long, bytes: Int): Unit =
    (0 until bytes).reverse.foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))

  private def mp4(width: Int, height: Int, durationMs: Long,
      v1: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    be(out, 16, 4); out.write("ftypisom".getBytes); be(out, 0, 4)
    val mvhdPayload = if (!v1) 100 else 112
    val moovSize = 8 + (8 + mvhdPayload) + 100
    be(out, moovSize, 4); out.write("moov".getBytes)
    be(out, 8 + mvhdPayload, 4); out.write("mvhd".getBytes)
    if (!v1) {
      be(out, 0, 4); be(out, 0, 4); be(out, 0, 4)
      be(out, 1000, 4); be(out, durationMs, 4)
    } else {
      out.write(1); out.write(0); out.write(0); out.write(0) // version 1
      be(out, 0, 8); be(out, 0, 8)                           // 64-bit times
      be(out, 1000, 4); be(out, durationMs, 8)
    }
    be(out, 0x00010000L, 4); be(out, 0x0100, 2); be(out, 0, 2)
    (0 until (8 + 36 + 24) / 4).foreach(_ => be(out, 0, 4)); be(out, 2, 4)
    be(out, 100, 4); out.write("trak".getBytes)
    be(out, 92, 4); out.write("tkhd".getBytes)
    (0 until 5).foreach(_ => be(out, 0, 4)); be(out, durationMs, 4)
    (0 until 2).foreach(_ => be(out, 0, 4)); (0 until 4).foreach(_ => be(out, 0, 2))
    (0 until 9).foreach(_ => be(out, 0, 4))
    be(out, width.toLong << 16, 4); be(out, height.toLong << 16, 4)
    out.toByteArray
  }

  test("MP4 box walk: v0 and v1 mvhd durations, 16.16 tkhd dims") {
    assert(VideoHeaderMeta.decode(mp4(640, 360, 123400L))
      .contains((640, 360, 123400L, "mp4")))
    assert(VideoHeaderMeta.decode(mp4(1920, 1080, 98765L, v1 = true))
      .contains((1920, 1080, 98765L, "mp4")))
    // truncated and garbage containers decline, never throw
    assert(VideoHeaderMeta.decode(mp4(640, 360, 5000L).take(40)).isEmpty)
    assert(VideoHeaderMeta.decode("not a video".getBytes).isEmpty)
    assert(VideoHeaderMeta.decode(Array.emptyByteArray).isEmpty)
  }

  test("video decoder never throws on arbitrary bytes (fuzz)") {
    val rnd = new scala.util.Random(99)
    (0 until 2000).foreach { i =>
      val len = rnd.nextInt(200)
      val b = Array.fill(len)(rnd.nextInt(256).toByte)
      // seed plausible magic in some iterations to reach the walkers
      if (i % 3 == 0 && len >= 12) {
        Array[Byte]('f', 't', 'y', 'p').copyToArray(b, 4)
      } else if (i % 3 == 1 && len >= 12) {
        Array[Byte]('R', 'I', 'F', 'F').copyToArray(b, 0)
        Array[Byte]('A', 'V', 'I', ' ').copyToArray(b, 8)
      }
      VideoHeaderMeta.decode(b) // must return, never throw
    }
  }

  test("synthetic MP4/AVI columns round-trip through the decoder exactly") {
    import org.apache.spark.sql.functions._
    val spark = graft.SharedSpark.spark
    val df = spark.range(1, 7).select(col("id"))
      .withColumn("content", when(col("id") % 2 === 0,
          graft.ext.Multimodal.syntheticMp4Content(
            (col("id") + 100).cast("int"), (col("id") + 50).cast("int"),
            col("id") * 1000))
        .otherwise(graft.ext.Multimodal.syntheticAviContent(
          (col("id") + 100).cast("int"), (col("id") + 50).cast("int"),
          lit(40000L), col("id") * 25)))
    val got = df.select(col("id"),
        graft.functions.GraftFunctions.videoHeaderMeta(col("content")).as("v"))
      .select(col("id"), col("v.width"), col("v.height"),
        col("v.duration_ms"), col("v.format"))
      .orderBy("id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == id + 100 && r.getInt(2) == id + 50)
      if (id % 2 == 0) {
        assert(r.getLong(3) == id * 1000 && r.getString(4) == "mp4")
      } else {
        assert(r.getLong(3) == 40000L * (id * 25) / 1000 && r.getString(4) == "avi")
      }
    }
  }

  test("MjpegFrames: movi chunks extract in order, rec lists unwrap, " +
      "odd payloads pad, garbage declines") {
    def avi(chunks: Seq[(String, Array[Byte])], wrapInRec: Boolean = false)
        : Array[Byte] = {
      val movi = new ByteArrayOutputStream()
      movi.write("movi".getBytes)
      val inner = new ByteArrayOutputStream()
      chunks.foreach { case (tag, payload) =>
        inner.write(tag.getBytes); le(inner, payload.length, 4)
        inner.write(payload)
        if (payload.length % 2 == 1) inner.write(0)
      }
      if (wrapInRec) {
        movi.write("LIST".getBytes); le(movi, 4L + inner.size(), 4)
        movi.write("rec ".getBytes)
      }
      movi.write(inner.toByteArray)
      val out = new ByteArrayOutputStream()
      out.write("RIFF".getBytes); le(out, 4L + 8 + movi.size(), 4)
      out.write("AVI ".getBytes)
      out.write("LIST".getBytes); le(out, movi.size(), 4)
      out.write(movi.toByteArray)
      out.toByteArray
    }
    val f1 = Array[Byte](1, 2, 3)        // odd length: padded
    val f2 = Array[Byte](4, 5, 6, 7)
    // plain chunks, in order, index chunks (ix/idx fourccs absent here)
    val got = MjpegFrames.extract(avi(Seq("00dc" -> f1, "01db" -> f2))).get
    assert(got.map(_.toSeq) == Seq(f1.toSeq, f2.toSeq))
    // interleave groups unwrap
    val rec = MjpegFrames.extract(
      avi(Seq("00dc" -> f1, "00dc" -> f2), wrapInRec = true)).get
    assert(rec.map(_.toSeq) == Seq(f1.toSeq, f2.toSeq))
    // non-frame chunks (audio '00wb', index) are skipped
    val mixed = MjpegFrames.extract(
      avi(Seq("00wb" -> f2, "00dc" -> f1))).get
    assert(mixed.map(_.toSeq) == Seq(f1.toSeq))
    // non-AVI and fuzz: decline, never throw
    assert(MjpegFrames.extract("not an avi".getBytes).isEmpty)
    assert(MjpegFrames.extract(null).isEmpty)
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { i =>
      val b = Array.fill(rnd.nextInt(160))(rnd.nextInt(256).toByte)
      if (i % 2 == 0 && b.length >= 12) {
        Array[Byte]('R', 'I', 'F', 'F').copyToArray(b, 0)
        Array[Byte]('A', 'V', 'I', ' ').copyToArray(b, 8)
      }
      MjpegFrames.extract(b) // must return, never throw
    }
  }

  test("Mp3FrameStats: frame walk, ID3 skip, VBR average, edge cases") {
    def frame(kbpsIdx: Int, padding: Int = 0): Array[Byte] = {
      val kbps = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320)(kbpsIdx)
      val len = 144000 * kbps / 44100 + padding
      val b = new Array[Byte](len)
      b(0) = 0xFF.toByte; b(1) = 0xFB.toByte
      b(2) = ((kbpsIdx << 4) | (padding << 1)).toByte
      b
    }
    def stats(b: Array[Byte]) = Mp3FrameStats.decode(b)
    // CBR: 3 frames at 128 kbps
    val cbr = frame(9) ++ frame(9) ++ frame(9)
    assert(stats(cbr).contains((3, 44100, 128.0, 3 * 1152.0 / 44100)))
    // VBR: 128 + 256 average 192; padding bit honored in the walk
    val vbr = frame(9, padding = 1) ++ frame(13)
    assert(stats(vbr).contains((2, 44100, 192.0, 2 * 1152.0 / 44100)))
    // ID3v2 tag skipped (syncsafe size 16)
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 16) ++
      new Array[Byte](16) ++ frame(11)
    assert(stats(id3).contains((1, 44100, 192.0, 1152.0 / 44100)))
    // truncated tail frame does not count
    assert(stats(cbr.dropRight(1)).contains((2, 44100, 128.0, 2 * 1152.0 / 44100)))
    // garbage after valid frames ends the walk without losing them
    assert(stats(frame(9) ++ "junk".getBytes).map(_._1).contains(1))
    // no valid frame → None
    assert(stats("not an mp3".getBytes).isEmpty)
    assert(stats(Array.emptyByteArray).isEmpty)
    assert(stats(null).isEmpty)
    // free-format (idx 0) and invalid (15) bitrates end the walk
    assert(stats(Array[Byte](0xFF.toByte, 0xFB.toByte, 0x00, 0x00)).isEmpty)
  }
}
