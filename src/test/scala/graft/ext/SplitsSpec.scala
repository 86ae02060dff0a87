package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class SplitsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("split fractions hold within tolerance and cover every row") {
    val ids = spark.range(100000).toDF("id")
    val got = Splits.assign(ids, "id",
      Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1))
    val counts = got.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "validation", "test"))
    assert(counts.values.sum == 100000L) // exhaustive, no null slivers
    assert(math.abs(counts("train") - 80000L) < 1000,
      s"train=${counts("train")}")
    assert(math.abs(counts("validation") - 10000L) < 600)
    assert(math.abs(counts("test") - 10000L) < 600)
  }

  test("assignment is a pure function of (key, seed)") {
    val ids = spark.range(2000).toDF("id")
    val a = Splits.assign(ids, "id").select("id", "split")
    val b = Splits.assign(ids, "id").select("id", "split")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // different seed reshuffles (at least one id moves)
    val c = Splits.assign(ids, "id", seed = 7L).select("id", "split")
    assert(a.exceptAll(c).count() > 0)
    // append-invariance: the same ids inside a 50x larger corpus keep
    // their assignments (randomSplit-style sampling breaks exactly here)
    val big = Splits.assign(spark.range(100000).toDF("id"), "id")
      .filter(col("id") < 2000).select("id", "split")
    assert(a.exceptAll(big).isEmpty)
  }

  test("rows sharing a group key can never straddle splits") {
    val rows = spark.range(30000)
      .select(col("id"), (col("id") % 500).as("site_id"))
    val got = Splits.assign(rows.toDF(), "site_id")
    val perKey = got.groupBy("site_id")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(perKey == 1L)
  }

  test("packShards: exact prefix sums and budget cuts on a known corpus") {
    val df = Seq((1L, 3), (2L, 4), (3L, 2), (4L, 5), (5L, 1), (6L, 2))
      .toDF("id", "w")
    val got = Splits.packShards(df, "id", "w", budget = 5, numPartitions = 3)
      .orderBy("id")
      .select("id", "offset_in_corpus", "shard")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 1L),
      (4L, 9L, 1L), (5L, 14L, 2L), (6L, 15L, 3L)))
  }

  test("packShards distributed prefix sum equals the single-window truth") {
    // deterministic pseudo-random weights over an id space large enough
    // to spread across many range partitions
    val df = spark.range(5000)
      .select(col("id"), (pmod(xxhash64(col("id")), lit(97)) + 1).as("w"))
    val got = Splits.packShards(df, "id", "w", budget = 1000,
      numPartitions = 16)
    val naive = df.withColumn("offset_in_corpus",
        coalesce(sum(col("w")).over(
          org.apache.spark.sql.expressions.Window.orderBy("id")
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("shard", floor(col("offset_in_corpus") / 1000))
    assert(got.select("id", "offset_in_corpus", "shard")
      .exceptAll(naive.select("id", "offset_in_corpus", "shard")).isEmpty)
    // ~equal-token shards: every shard except the last holds >= budget -
    // max(w) and < budget + max(w) tokens
    val sizes = got.groupBy("shard").agg(sum(col("w")).as("tok"))
      .orderBy("shard").as[(Long, Long)].collect()
    assert(sizes.init.forall { case (_, tok) =>
      tok >= 1000 - 97 && tok <= 1000 + 97 }, sizes.mkString(","))
  }

  test("degenerate configurations are rejected") {
    val df = spark.range(1).toDF("id")
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq("only" -> 1.0)))
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq("a" -> 1.0, "b" -> -0.1)))
  }

  test("domain mix: exact at weights 0/1, within tolerance in between") {
    val docs = spark.range(30000)
      .select(col("id"), (col("id") % 3).cast("string").as("dom"))
    val kept = Splits.domainMix(docs, "dom", "id",
      Map("0" -> 1.0, "1" -> 0.5, "2" -> 0.0))
    val counts = kept.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(counts.getOrElse("0", 0L) == 10000L) // weight 1: keep ALL
    assert(!counts.contains("2"))               // weight 0: keep NONE
    assert(math.abs(counts("1") - 5000L) < 400, s"half=${counts("1")}")
  }

  test("domain mix is stable, append-invariant, and default-weighted") {
    val docs = spark.range(5000)
      .select(col("id"), lit("web").as("dom"))
    def mix(d: org.apache.spark.sql.DataFrame) =
      Splits.domainMix(d, "dom", "id", Map("books" -> 1.0),
        defaultWeight = 0.3)
    val a = mix(docs)
    assert(a.exceptAll(mix(docs)).isEmpty) // pure function of (key, seed)
    assert(math.abs(a.count() - 1500L) < 200)
    // append-invariance: the kept subset of a larger corpus is exactly
    // the kept set of the subset
    val big = spark.range(50000).select(col("id"), lit("web").as("dom"))
    assert(mix(big).filter(col("id") < 5000).exceptAll(a).isEmpty)
  }

  test("mix seed is independent of the split seed (no train-only bias)") {
    // with a SHARED seed a 50% mix would keep exactly the low half of
    // the unit interval — entirely inside train's [0, .98) — and the
    // validation/test splits of the kept corpus would be EMPTY
    val docs = spark.range(20000).select(col("id"), lit("web").as("dom"))
    val kept = Splits.domainMix(docs, "dom", "id", Map("web" -> 0.5))
    val splits = Splits.assign(kept, "id").groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(splits.getOrElse("validation", 0L) > 0)
    assert(splits.getOrElse("test", 0L) > 0)
  }

  test("mix rejects up-weights above 1 (epoch replication is not sampling)") {
    val df = spark.range(1).select(col("id"), lit("x").as("dom"))
    intercept[IllegalArgumentException](
      Splits.domainMix(df, "dom", "id", Map("x" -> 1.5)))
  }

  test("replicate: exact integer epochs, sampled fractional epoch") {
    val docs = spark.range(10000)
      .select(col("id"), (col("id") % 2).cast("string").as("dom"))
    val rep = Splits.replicate(docs, "dom", "id",
      Map("0" -> 2.0, "1" -> 2.5))
    val counts = rep.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(counts("0") == 10000L) // exactly x2 of the 5000 dom-0 rows
    assert(math.abs(counts("1") - 12500L) < 400, s"x2.5=${counts("1")}")
    // every dom-0 row appears at epochs 0 and 1, never 2
    val epochs = rep.filter(col("dom") === "0").groupBy("id")
      .agg(sort_array(collect_list(col("epoch"))).as("es"))
      .select("es").distinct().as[Seq[Long]].collect()
    assert(epochs.toSeq == Seq(Seq(0L, 1L)))
    // dom-1 rows appear 2 or 3 times, and both multiplicities occur
    val m1 = rep.filter(col("dom") === "1").groupBy("id").count()
      .select("count").distinct().as[Long].collect().toSet
    assert(m1 == Set(2L, 3L))
  }

  test("shuffled: a stable permutation that differs from key order") {
    val ids = spark.range(20000).toDF("id")
    val a = Splits.shuffled(ids, "id")
    val pos = a.select("pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until 20000L)) // exact permutation of 0..n-1
    // pure function of (key set, seed): a re-run reproduces every position
    val b = Splits.shuffled(ids, "id").withColumnRenamed("pos", "pos2")
    assert(a.join(b, "id").filter(col("pos") =!= col("pos2")).isEmpty)
    // and it genuinely shuffles: most keys move off their own rank
    val moved = a.filter(col("pos") =!= col("id")).count()
    assert(moved > 19000, s"only $moved of 20000 displaced")
    // a different seed is a different permutation
    val c = Splits.shuffled(ids, "id", seed = 1L).withColumnRenamed("pos", "pos3")
    assert(a.join(c, "id").filter(col("pos") =!= col("pos3")).count() > 0)
  }

  test("shuffled equals the single-window truth on a known set") {
    val ids = spark.range(500).toDF("id")
    val got = Splits.shuffled(ids, "id").orderBy("pos")
      .select("id").as[Long].collect().toSeq
    val naive = ids
      .withColumn("h", xxhash64(col("id"), lit(Splits.ShuffleSeed)))
      .orderBy(col("h"), col("id")).select("id").as[Long].collect().toSeq
    assert(got == naive)
  }

  test("replicate at w < 1 reduces to domainMix (same kept keys)") {
    val docs = spark.range(5000).select(col("id"), lit("w").as("dom"))
    val rep = Splits.replicate(docs, "dom", "id", Map("w" -> 0.4))
    val mix = Splits.domainMix(docs, "dom", "id", Map("w" -> 0.4))
    assert(rep.select("id").exceptAll(mix.select("id")).isEmpty)
    assert(mix.select("id").exceptAll(rep.select("id")).isEmpty)
    assert(rep.agg(max(col("epoch"))).head().getLong(0) == 0L)
    // weight 0 drops the domain entirely
    assert(Splits.replicate(docs, "dom", "id", Map("w" -> 0.0)).isEmpty)
  }

  test("stratifiedSampleExact: exact k per stratum, skew-proof, stable, window-truth") {
    // one hot stratum (900 rows), one normal (90), one under k (4)
    val rows = (0 until 900).map(i => (i.toLong, "hot")) ++
      (1000 until 1090).map(i => (i.toLong, "mid")) ++
      (2000 until 2004).map(i => (i.toLong, "tiny"))
    val df = rows.toDF("id", "st")
    val got = Splits.stratifiedSampleExact(df, "st", "id", k = 20, seed = 7L)
    val counts = got.groupBy("st").count().as[(String, Long)].collect().toMap
    assert(counts == Map("hot" -> 20L, "mid" -> 20L, "tiny" -> 4L))
    // stable: same seed → identical set
    val again = Splits.stratifiedSampleExact(df, "st", "id", k = 20, seed = 7L)
    assert(got.select("id").except(again.select("id")).isEmpty)
    // a different seed draws a different uniform sample
    val other = Splits.stratifiedSampleExact(df, "st", "id", k = 20, seed = 8L)
    assert(other.select("id").except(got.select("id")).count() > 0)
    // single-truth equivalence: the bounded-heap picks exactly the
    // window-ranked k smallest hashes per stratum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("st")).orderBy(xxhash64(col("id"), lit(7L)), col("id"))
    val naive = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20).select("id").as[Long].collect().toSet
    assert(got.select("id").as[Long].collect().toSet == naive)
  }

  test("alpha sampling: alpha=0 equalizes, alpha=1 is natural, rates " +
      "cap at 1, null domains drop, deterministic") {
    // skewed corpus: 24k / 5.4k / 600 (+ 30 null-domain rows)
    val docs = spark.range(30000)
      .select(col("id"),
        when(col("id") % 1000 === 0, lit(null).cast("string"))
          .when(col("id") % 50 === 1, lit("small"))
          .when(col("id") % 5 < 1, lit("mid"))
          .otherwise(lit("big")).as("dom"))
    val tot = docs.filter(col("dom").isNotNull)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    def kept(a: Double, target: Long): Map[String, Long] =
      Splits.alphaSample(docs, "dom", "id", a, target)
        .groupBy("dom").count().as[(String, Long)].collect().toMap
    // alpha=0: equal target share per domain; the small domain caps at
    // its full size (rate 1) and keeps EXACTLY everything
    val t0 = 9000L
    val k0 = kept(0.0, t0)
    assert(k0("small") == tot("small"))
    assert(math.abs(k0("big") - t0 / 3.0) < t0 / 3.0 * 0.1)
    assert(math.abs(k0("mid") - t0 / 3.0) < t0 / 3.0 * 0.1)
    assert(!k0.contains(null)) // null domains never survive
    // alpha=1: one natural rate r = target/N for every domain
    val n = tot.values.sum
    val k1 = kept(1.0, n / 2)
    tot.foreach { case (d, c) =>
      assert(math.abs(k1(d).toDouble / c - 0.5) < 0.1, s"domain $d") }
    // deterministic: same call, same rows
    assert(kept(0.3, 9000) == kept(0.3, 9000))
    // target beyond the corpus: every rate caps, everything keeps
    assert(kept(0.5, 10 * n).values.sum == n)
    intercept[IllegalArgumentException](
      Splits.alphaSample(docs, "dom", "id", 1.5, 10))
  }

  test("token-budget mix: kept token mass lands on the budget; " +
      "under-budget keeps all, zero budget and unlisted domains drop") {
    // per-row token weights vary 1..20, so hitting a TOKEN budget is
    // not the same as hitting a row fraction
    val docs = spark.range(12000)
      .select(col("id"),
        when(col("id") % 3 === 0, "web").when(col("id") % 3 === 1, "code")
          .otherwise("books").as("dom"),
        (col("id") % 20 + 1).cast("long").as("toks"))
    val tot = docs.groupBy("dom").agg(sum("toks").as("t"))
      .as[(String, Long)].collect().toMap
    val budgets = Map("web" -> tot("web") / 4, // carve to a quarter
      "code" -> tot("code") * 5,               // under budget: keep all
      "books" -> 0L)                           // drop entirely
    def run() = Splits.tokenBudgetMix(docs, "dom", "id", "toks", budgets)
      .groupBy("dom").agg(sum("toks").as("t"))
      .as[(String, Long)].collect().toMap
    val kept = run()
    assert(math.abs(kept("web").toDouble / (tot("web") / 4) - 1.0) < 0.1,
      s"web kept ${kept("web")} vs budget ${tot("web") / 4}")
    assert(kept("code") == tot("code"))
    assert(!kept.contains("books"))
    // deterministic: same call, same kept mass
    assert(run() == kept)
    // unlisted domains survive only with keepUnlisted
    val withUnlisted = Splits.tokenBudgetMix(docs, "dom", "id", "toks",
      budgets - "books", keepUnlisted = true)
      .groupBy("dom").agg(sum("toks").as("t"))
      .as[(String, Long)].collect().toMap
    assert(withUnlisted("books") == tot("books"))
    intercept[IllegalArgumentException](
      Splits.tokenBudgetMix(docs, "dom", "id", "toks", Map("web" -> -1L)))
  }

  test("token-budget mix: a zero-token domain with a positive budget is " +
      "under budget (keeps all); NULL token sums read null-safely") {
    // 'empty' rows carry 0 tokens, 'nulls' rows a NULL token count —
    // both are trivially under any positive budget and must keep every
    // row; with budget 0 they must drop
    val docs = spark.range(60)
      .select(col("id"),
        when(col("id") % 3 === 0, "empty").when(col("id") % 3 === 1, "nulls")
          .otherwise("web").as("dom"),
        when(col("id") % 3 === 0, lit(0L))
          .when(col("id") % 3 === 1, lit(null).cast("long"))
          .otherwise(lit(5L)).as("toks"))
    val kept = Splits.tokenBudgetMix(docs, "dom", "id", "toks",
        Map("empty" -> 10L, "nulls" -> 10L, "web" -> 1000L))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(kept("empty") == 20 && kept("nulls") == 20 && kept("web") == 20)
    val dropped = Splits.tokenBudgetMix(docs, "dom", "id", "toks",
        Map("empty" -> 0L, "nulls" -> 0L, "web" -> 1000L))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(!dropped.contains("empty") && !dropped.contains("nulls") &&
      dropped("web") == 20)
  }

  test("md5Keep: rates hold, decisions are stable/append-invariant, " +
      "and the JVM replay of the threshold math agrees") {
    val ids = spark.range(20000).toDF("id")
    def keptAt(rate: Double) = ids
      .filter(Splits.md5Keep(col("id"), "s1", lit(rate))).count()
    assert(keptAt(0.0) == 0 && keptAt(1.0) == 20000)
    val half = keptAt(0.5)
    assert(math.abs(half - 10000) < 450, s"rate 0.5 kept $half")
    // stable + append-invariant (pure function of key and salt)
    val a = ids.filter(Splits.md5Keep(col("id"), "s1", lit(0.3)))
      .as[Long].collect().toSet
    val b = spark.range(40000).toDF("id")
      .filter(Splits.md5Keep(col("id"), "s1", lit(0.3)))
      .filter(col("id") < 20000).as[Long].collect().toSet
    assert(a == b)
    // salts decorrelate
    val c = ids.filter(Splits.md5Keep(col("id"), "s2", lit(0.3)))
      .as[Long].collect().toSet
    assert(a != c)
    // the exact threshold arithmetic the oracle twin replays: first 32
    // bits of md5("<id>:<salt>") as an unsigned int vs rate * 2^32
    val md = java.security.MessageDigest.getInstance("MD5")
    def jvmKeep(id: Long, salt: String, rate: Double): Boolean = {
      val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16).toDouble < rate * 4294967296.0
    }
    val got = spark.range(500).toDF("id")
      .select(col("id"), Splits.md5Keep(col("id"), "s1", lit(0.37)).as("k"))
      .as[(Long, Boolean)].collect()
    got.foreach { case (id, k) => assert(k == jvmKeep(id, "s1", 0.37), s"id $id") }
  }
}
