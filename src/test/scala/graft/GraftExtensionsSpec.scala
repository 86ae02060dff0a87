package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extension point installs every custom function builder") {
    // applying to a fresh extensions object must register all builders
    // without throwing (session-level behavior is covered by the SQL
    // registration test in ExpressionsSpec — same builder table)
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftExtensions.functions.map(_._1).toSet == Set(
      "cosine_similarity", "l2_norm", "minhash_signature", "shingle_hashes",
      "simhash64", "rolling_hash", "hyperplane_lsh", "image_header_meta",
      "audio_header_meta", "video_header_meta", "mjpeg_frames",
      "mp3_frame_stats", "bmp_pixel_stats", "wav_pcm_stats",
      "image_pixel_stats", "image_dhash", "audio_energy_hash",
      "bpe_pretokenize", "bpe_tokenize", "quality_score"))
  }

  test("SQL forms of the round-20 tiers run against the shipped artifacts") {
    val spark = SharedSpark.spark
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT size(bpe_tokenize(' the data table')) AS n, " +
        "bpe_pretokenize(' the data table') AS w, " +
        "round(quality_score('The data is in the table and can be read.'), 6) AS q")
      .head()
    assert(row.getInt(0) >= 3) // common words ≈ 1 token each
    assert(row.getSeq[String](1) == Seq("Ġthe", "Ġdata", "Ġtable"))
    assert(row.getDouble(2) >= 0.5) // prose keeps
  }

  test("builders construct valid expressions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftExtensions.functions.foreach { case (name, builder) =>
      val arity = if (name == "cosine_similarity") 2 else 1
      val expr = builder(Seq.fill(arity)(Literal(1L)))
      assert(expr != null, name)
    }
  }
}
