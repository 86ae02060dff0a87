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

  test("degenerate configurations are rejected") {
    val df = spark.range(1).toDF("id")
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq("only" -> 1.0)))
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq("a" -> 1.0, "b" -> -0.1)))
  }
}
