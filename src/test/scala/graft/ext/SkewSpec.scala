package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 1000 rows on a single hot key + a long tail
  private lazy val skewed = ((1 to 1000).map(i => (1, s"hot$i")) ++
    (2 to 50).map(k => (k, s"tail$k"))).toDF("k", "payload")
  private lazy val dim = (1 to 50).map(k => (k, s"name$k")).toDF("k", "name")

  test("salted inner join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "payload", "name")
    val salted = Skew.saltedJoin(skewed, dim, "k", factor = 8)
      .orderBy("k", "payload", "name")
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.collect().sameElements(plain.collect()))
  }

  test("salted left join keeps unmatched left rows") {
    val withOrphan = skewed.union(Seq((999, "orphan")).toDF("k", "payload"))
    val out = Skew.saltedJoin(withOrphan, dim, "k", factor = 4, joinType = "left")
    assert(out.count() == withOrphan.count())
    assert(out.filter($"k" === 999 && $"name".isNull).count() == 1)
  }

  test("the hot key actually spreads across salt sub-keys") {
    val salts = skewed.filter($"k" === 1)
      .withColumn("_salt",
        pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key only hit $salts of 8 salts")
  }

  test("factor 1 degenerates to the plain join") {
    val out = Skew.saltedJoin(skewed, dim, "k", factor = 1)
    assert(out.count() == skewed.join(dim, Seq("k")).count())
  }

  test("saltCols override: same rows, narrow hash still spreads the hot key") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "payload", "name")
    val salted = Skew.saltedJoin(skewed, dim, "k", factor = 8,
      saltCols = Seq("payload")).orderBy("k", "payload", "name")
    assert(salted.collect().sameElements(plain.collect()))
    val salts = skewed.filter($"k" === 1)
      .withColumn("_salt", pmod(xxhash64(col("payload")), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key only hit $salts of 8 salts via payload hash")
  }

  test("saltCols naming a missing column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", factor = 4, saltCols = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
