package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

/** Column-API facade over the custom Catalyst expressions + SQL
  * registration, so both DataFrame code and `spark.sql` can use them
  * (build-contract preference (b): native Expression over UDF — these
  * stay inside codegen / tight eval loops instead of ser/de per row).
  */
object GraftFunctions {

  /** Cosine similarity of two `array<float>` columns (codegen'd). */
  def cosineSim(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))

  /** L2 norm of an `array<float>` column (codegen'd). */
  def l2Norm(a: Column): Column = toCol(L2Norm(toExpr(a)))

  /** MinHash signature (`array<bigint>` length numHashes) of a token
    * array (`array<string>`, or pre-hashed `array<bigint>`). */
  def minhashSignature(tokens: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    toCol(MinHashSignature(toExpr(tokens), numHashes, seed))

  /** Hashed word n-gram shingles (`array<bigint>`) of a token array —
    * the string-free shingle representation for dedup hot paths. */
  def shingleHashes(tokens: Column, n: Int = 3, seed: Long = 42L): Column =
    toCol(ShingleHashes(toExpr(tokens), n, seed))

  /** Quantile rank of a value among sorted boundary values (external
    * JVM representations; converted to Catalyst-internal once here) —
    * the z-order layout helper. */
  def quantileRank(c: Column, boundaries: Seq[Any]): Column =
    toCol(QuantileRank(toExpr(c), boundaries.map(
      org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst)
      .toArray))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column, seed: Long = 42L): Column =
    toCol(SimHash64(toExpr(tokens), seed))

  /** Polynomial rolling hash of a string (document fingerprint). */
  def rollingHash(text: Column, base: Long = 1000003L,
      modulus: Long = (1L << 61) - 1): Column =
    toCol(RollingHash(toExpr(text), base, modulus))

  /** Random-hyperplane sign sketch of an `array<float>` (cosine LSH bucket). */
  def hyperplaneLsh(vec: Column, numPlanes: Int = 16, seed: Long = 42L): Column =
    toCol(HyperplaneLsh(toExpr(vec), numPlanes, seed))

  /** PNG/JPEG/GIF/BMP header decode of a binary column →
    * `struct<width,height,channels,format>`, NULL when unrecognized. */
  def imageHeaderMeta(content: Column): Column =
    toCol(ImageHeaderMeta(toExpr(content)))

  /** WAV/RIFF header decode of a binary column →
    * `struct<sample_rate,channels,bits,duration_ms,format>`, NULL when
    * unrecognized. */
  def audioHeaderMeta(content: Column): Column =
    toCol(AudioHeaderMeta(toExpr(content)))

  /** MP4/AVI container-header decode of a binary column →
    * `struct<width,height,duration_ms,format>`, NULL when
    * unrecognized (codec-level frame decode stays stubbed — SURVEY §8). */
  def videoHeaderMeta(content: Column): Column =
    toCol(VideoHeaderMeta(toExpr(content)))

  /** Full pixel decode of an uncompressed (BI_RGB 24/32-bit) BMP →
    * `struct<width,height,n_pixels,mean_r,mean_g,mean_b>`, NULL for
    * anything needing a real codec. */
  def bmpPixelStats(content: Column): Column =
    toCol(BmpPixelStats(toExpr(content)))

  /** Full sample decode of a PCM (8/16-bit) WAV data chunk →
    * `struct<n_samples,rms,peak>` with amplitudes normalized to
    * [-1, 1]; NULL for non-PCM payloads. */
  def wavPcmStats(content: Column): Column =
    toCol(WavPcmStats(toExpr(content)))

  /** MPEG-1 Layer III frame-header walk (codec-free) →
    * `struct<frames,sample_rate,avg_bitrate_kbps,duration_sec>`;
    * handles a leading ID3v2 tag and VBR streams. NULL when no valid
    * frame is found. */
  def mp3FrameStats(content: Column): Column =
    toCol(Mp3FrameStats(toExpr(content)))

  /** Full pixel decode of any COMPRESSED image the JDK can read
    * (PNG/JPEG/GIF/BMP via `javax.imageio`) →
    * `struct<width,height,n_pixels,mean_r,mean_g,mean_b>`, NULL for
    * undecodable bytes. */
  def imagePixelStats(content: Column): Column =
    toCol(ImagePixelStats(toExpr(content)))

  /** REAL video-frame extraction for Motion-JPEG AVI: the `movi`
    * chunk payloads as `array<binary>` — each a complete JPEG for
    * [[imagePixelStats]]/[[imageDHash]]. NULL for non-AVI payloads;
    * inter-frame codecs stay stubbed (no JDK decoder). */
  def mjpegFrames(content: Column): Column =
    toCol(MjpegFrames(toExpr(content)))

  /** 64-bit perceptual difference hash (dHash) of an ImageIO-decodable
    * binary column; NULL for undecodable bytes. */
  def imageDHash(content: Column): Column =
    toCol(ImageDHash(toExpr(content)))

  /** 64-bit energy-envelope fingerprint of a PCM WAV binary column;
    * NULL for non-PCM payloads or sub-65-sample clips. */
  def audioEnergyHash(content: Column): Column =
    toCol(AudioEnergyHash(toExpr(content)))

  /** Whitespace-mapped GPT-2-shape pretokens (`array<string>`) — the
    * corpus half of BPE training and the word tokenizer the merge tier
    * builds on. */
  def bpePretokenize(text: Column): Column =
    toCol(BpePretokenize(toExpr(text)))

  /** Full BPE subword stream (`array<string>`) under a rank-map merge
    * table — plan size independent of merge count. */
  def bpeTokenize(text: Column, table: BpeTable): Column =
    toCol(BpeTokenize(toExpr(text), table))

  /** Learned-quality classifier score in (0,1) under frozen weights —
    * one tight JVM pass per row (codegen'd). */
  def qualityScore(text: Column, model: QualityModelRef): Column =
    toCol(QualityScore(toExpr(text), model))

  /** Constant-color image payload in a real compressed container
    * (`format`: png | jpg | gif | bmp) from `(w, h, r, g, b)` int
    * columns — planted-oracle payload generation. */
  def imageEncodeConst(format: String, w: Column, h: Column,
      r: Column, g: Column, b: Column): Column =
    toCol(ImageConstEncode(format, toExpr(
      org.apache.spark.sql.functions.struct(w, h, r, g, b))))

  /** Register every custom function for SQL use on an existing session.
    * Same builder table as [[graft.GraftExtensions]] (the config-driven
    * `spark.sql.extensions` path). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, es => builder(es), "built-in")
    }
  }
}
