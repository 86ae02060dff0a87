package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: wire the custom expressions into
  * any session via config — `spark.sql.extensions=graft.GraftExtensions`
  * — the deployment-grade registration path (survives session cloning,
  * works from spark-submit/Thrift server, no imperative register call).
  * [[graft.functions.GraftFunctions.register]] remains the programmatic
  * equivalent for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
}

object GraftExtensions {
  /** Name → builder for every custom expression (single source of truth
    * shared with the imperative registration). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "l2_norm" -> (es => L2Norm(es.head)),
    "minhash_signature" -> (es => MinHashSignature(es.head, 64, 42L)),
    "shingle_hashes" -> (es => ShingleHashes(es.head, 3, 42L)),
    "simhash64" -> (es => SimHash64(es.head, 42L)),
    "rolling_hash" -> (es => RollingHash(es.head, 1000003L, (1L << 61) - 1)),
    "hyperplane_lsh" -> (es => HyperplaneLsh(es.head, 16, 42L)),
    "image_header_meta" -> (es => ImageHeaderMeta(es.head)),
    "audio_header_meta" -> (es => AudioHeaderMeta(es.head)),
    "video_header_meta" -> (es => VideoHeaderMeta(es.head)),
    "mjpeg_frames" -> (es => MjpegFrames(es.head)),
    "mp3_frame_stats" -> (es => Mp3FrameStats(es.head)),
    "bmp_pixel_stats" -> (es => BmpPixelStats(es.head)),
    "wav_pcm_stats" -> (es => WavPcmStats(es.head)),
    "image_pixel_stats" -> (es => ImagePixelStats(es.head)),
    "image_dhash" -> (es => ImageDHash(es.head)),
    "audio_energy_hash" -> (es => AudioEnergyHash(es.head)),
    // bound to the shipped artifacts (the common call; parameterized
    // tables/models go through the Column API)
    "bpe_pretokenize" -> (es => BpePretokenize(es.head)),
    "bpe_tokenize" -> (es =>
      BpeTokenize(es.head, graft.ext.BpeVocab.Default)),
    "quality_score" -> (es =>
      QualityScore(es.head, graft.ext.Classify.PinnedModel.ref)))
}
