package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Custom Catalyst expressions: determinism, shape, and hand-computed
  * golden values.
  */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("minhashSignature has numHashes entries and is deterministic") {
    val df = Seq(Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("x", "y"))
      .toDF("toks")
      .select(GraftFunctions.minhashSignature(col("toks"), 16).as("sig"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows.forall(_.length == 16))
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }

  test("minhash signature agreement tracks jaccard similarity") {
    val a = (1 to 50).map(_.toString)
    val b = (1 to 45).map(_.toString) ++ Seq("x1", "x2", "x3", "x4", "x5")
    val df = Seq((a, b)).toDF("ta", "tb").select(
      GraftFunctions.minhashSignature(col("ta")).as("sa"),
      GraftFunctions.minhashSignature(col("tb")).as("sb"))
    val (sa, sb) = df.as[(Seq[Long], Seq[Long])].head()
    val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
    val jaccard = 45.0 / 55.0
    assert(math.abs(agree - jaccard) < 0.25) // 64 hashes → coarse estimate
  }

  test("minhashSignature over pre-hashed bigints equals the information path") {
    val df = Seq(Seq("a", "b", "c", "d", "e")).toDF("toks").select(
      GraftFunctions.minhashSignature(
        GraftFunctions.shingleHashes(col("toks"), 2)).as("sig"))
    assert(df.as[Seq[Long]].head().length == 64)
  }

  test("shingleHashes emits max(1, n_tokens - n + 1) windows") {
    val df = Seq(
      Seq("a", "b", "c", "d"), // 2 windows of 3
      Seq("a", "b"),           // shorter than n → 1
      Seq.empty[String]        // empty → 1
    ).toDF("toks").select(GraftFunctions.shingleHashes(col("toks"), 3).as("h"))
    assert(df.as[Seq[Long]].collect().map(_.length).toSeq == Seq(2, 1, 1))
  }

  test("shingleHashes is order-sensitive and position-independent") {
    val df = Seq(
      Seq("a", "b", "c"),
      Seq("c", "b", "a"),
      Seq("z", "a", "b", "c") // shares the (a,b,c) window at another offset
    ).toDF("toks").select(GraftFunctions.shingleHashes(col("toks"), 3).as("h"))
    val Seq(abc, cba, zabc) = df.as[Seq[Long]].collect().toSeq
    assert(abc != cba)
    assert(zabc.contains(abc.head)) // same window hash at a shifted position
  }

  test("rollingHash matches a hand-rolled polynomial evaluation") {
    val base = 1000003L
    val mod = (1L << 61) - 1
    val expected = "ab".getBytes.foldLeft(0L)((h, b) =>
      (h * base + (b & 0xFF)) % mod)
    val got = Seq("ab").toDF("t")
      .select(GraftFunctions.rollingHash(col("t")).as("h")).as[Long].head()
    assert(got == expected)
  }

  test("simhash64 of identical token sets is identical; disjoint sets differ") {
    val df = Seq(Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("p", "q", "r"))
      .toDF("toks").select(GraftFunctions.simhash64(col("toks")).as("s"))
    val Seq(x, y, z) = df.as[Long].collect().toSeq
    assert(x == y)
    assert(x != z)
  }

  test("cosineSim golden values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),  // 1.0
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),  // 0.0
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f))   // 1/sqrt(2)
    ).toDF("a", "b")
      .select(GraftFunctions.cosineSim(col("a"), col("b")).as("c"))
    val Seq(same, orth, diag) = df.as[Double].collect().toSeq
    assert(math.abs(same - 1.0) < 1e-6)
    assert(math.abs(orth) < 1e-6)
    assert(math.abs(diag - 1.0 / math.sqrt(2)) < 1e-6)
  }

  test("hyperplaneLsh buckets are deterministic and within 2^planes") {
    val vecs = Seq(
      Array(0.1f, 0.9f, -0.3f), Array(0.1f, 0.9f, -0.3f), Array(-1f, 2f, 0.5f))
    val df = vecs.toDF("v")
      .select(GraftFunctions.hyperplaneLsh(col("v"), 8).as("b"))
    val Seq(a, b, c) = df.as[Long].collect().toSeq
    assert(a == b)
    assert(a >= 0 && a < 256 && c >= 0 && c < 256)
  }

  test("SQL registration exposes the functions to spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c," +
        " simhash64(array('a','b')) AS s," +
        " size(shingle_hashes(array('a','b','c','d'))) AS n," +
        " mp3_frame_stats(cast('not an mp3' AS binary)) AS m," +
        " mjpeg_frames(cast('not an avi' AS binary)) AS f")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
    assert(r.getInt(2) == 2)
    // media decoders are registered and answer null on undecodable input
    assert(r.isNullAt(3))
    assert(r.isNullAt(4))
  }
}
