package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Aggregate navigation: Engine answers restricted GROUP BY queries
  * from a fresh materialized view — proven by the answer's input files
  * living under the VIEW's directory, not the base table's — and falls
  * through to the scan whenever any soundness gate fails (stale view,
  * non-group filter, non-derivable aggregate, unknown ORDER BY).
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture(): (graft.catalog.GraftCatalog, Engine) = {
    val cat = new graft.catalog.GraftCatalog(
      Files.createTempDirectory("graft-mvrw"), spark)
    cat.createDatabase("default")
    (cat, new Engine(cat))
  }

  private def sales(n: Int) = (0 until n)
    .map(i => (i, s"grp${i % 3}", s"reg${i % 2}", i * 1.5))
    .toDF("id", "grp", "region", "amount")

  private def readsFrom(df: DataFrame, dir: String): Boolean = {
    val files = df.inputFiles
    files.nonEmpty && files.forall(_.contains(s"/$dir/"))
  }

  private def build(): (graft.catalog.GraftCatalog, Engine) = {
    val (cat, eng) = fixture()
    cat.createTable("sales", sales(1).schema)
    cat.append("sales", sales(60), 1000L)
    eng.sql("CREATE MATERIALIZED VIEW sales_mv AS SELECT grp, region, " +
      "count(*) AS cnt, sum(amount) AS total, avg(amount) AS mean " +
      "FROM sales GROUP BY grp, region")
    (cat, eng)
  }

  test("exact-group query answers from the view and matches the scan") {
    val (cat, eng) = build()
    val q = "SELECT grp, region, count(*) AS cnt, sum(amount) AS total " +
      "FROM sales GROUP BY grp, region ORDER BY grp, region"
    val viaMv = eng.sql(q)
    assert(readsFrom(viaMv, "sales_mv"), "expected the view to answer")
    val want = cat.table("sales").groupBy($"grp", $"region")
      .agg(count(lit(1)).as("cnt"), sum($"amount").as("total"))
      .orderBy($"grp", $"region").collect().toSeq
    assert(viaMv.collect().toSeq == want)
  }

  test("roll-up to coarser groups re-merges state; avg re-derives") {
    val (cat, eng) = build()
    val viaMv = eng.sql("SELECT grp, count(*) AS cnt, avg(amount) AS mean " +
      "FROM sales GROUP BY grp ORDER BY mean DESC")
    assert(readsFrom(viaMv, "sales_mv"))
    val want = cat.table("sales").groupBy($"grp")
      .agg(count(lit(1)).as("cnt"), avg($"amount").as("mean"))
      .orderBy($"mean".desc).collect().toSeq
    assert(viaMv.collect().toSeq == want)
  }

  test("WHERE on a view group column filters state; any other column " +
      "falls through to the scan") {
    val (cat, eng) = build()
    val filtered = eng.sql("SELECT grp, count(*) AS cnt FROM sales " +
      "WHERE region = 'reg1' GROUP BY grp ORDER BY grp")
    assert(readsFrom(filtered, "sales_mv"))
    val want = cat.table("sales").filter($"region" === "reg1")
      .groupBy($"grp").agg(count(lit(1)).as("cnt"))
      .orderBy($"grp").collect().toSeq
    assert(filtered.collect().toSeq == want)

    val scan = eng.sql("SELECT grp, count(*) AS cnt FROM sales " +
      "WHERE amount > 10 GROUP BY grp")
    assert(readsFrom(scan, "sales"), "non-group filter must scan the base")
  }

  test("a stale view never answers; refresh re-enables the rewrite") {
    val (cat, eng) = build()
    cat.append("sales", sales(30), 2000L)
    val q = "SELECT grp, count(*) AS cnt FROM sales GROUP BY grp ORDER BY grp"
    val stale = eng.sql(q)
    assert(readsFrom(stale, "sales"), "stale view must fall through")
    // and the scan is CORRECT (sees the new rows the view lacks)
    assert(stale.collect().map(_.getLong(1)).sum == 90L)
    eng.sql("REFRESH MATERIALIZED VIEW sales_mv")
    val fresh = eng.sql(q)
    assert(readsFrom(fresh, "sales_mv"))
    assert(fresh.collect().map(_.getLong(1)).sum == 90L)
  }

  test("HAVING and LIMIT rewrite: agg-call spelling folds to its alias; " +
      "top-k dashboards answer from the view") {
    val (cat, eng) = build()
    val topk = eng.sql("SELECT grp, region, count(*) AS cnt, " +
      "sum(amount) AS total FROM sales GROUP BY grp, region " +
      "HAVING count(*) > 5 ORDER BY total DESC LIMIT 3")
    assert(readsFrom(topk, "sales_mv"))
    val want = cat.table("sales").groupBy($"grp", $"region")
      .agg(count(lit(1)).as("cnt"), sum($"amount").as("total"))
      .filter($"cnt" > 5).orderBy($"total".desc).limit(3)
      .collect().toSeq
    assert(topk.collect().toSeq == want)
    // HAVING count(*) derives even though cnt is not in the SELECT list?
    // No — count(*) must be a SELECT item to fold; otherwise fall through.
    assert(readsFrom(eng.sql("SELECT grp, sum(amount) AS total FROM sales " +
      "GROUP BY grp HAVING count(*) > 5"), "sales"))
  }

  test("PARTIAL view: same-predicate queries answer from the view; " +
      "other predicates (or none) scan") {
    val (cat, eng) = fixture()
    cat.createTable("sales", sales(1).schema)
    cat.append("sales", sales(60), 1000L)
    eng.sql("CREATE MATERIALIZED VIEW big_mv AS SELECT grp, " +
      "count(*) AS cnt, sum(amount) AS total FROM sales " +
      "WHERE amount > 30 GROUP BY grp")
    val q = "SELECT grp, count(*) AS cnt, sum(amount) AS total " +
      "FROM sales WHERE amount > 30 GROUP BY grp ORDER BY grp"
    val viaMv = eng.sql(q)
    assert(readsFrom(viaMv, "big_mv"))
    val want = cat.table("sales").filter($"amount" > 30).groupBy($"grp")
      .agg(count(lit(1)).as("cnt"), sum($"amount").as("total"))
      .orderBy($"grp").collect().toSeq
    assert(viaMv.collect().toSeq == want)
    // refresh keeps the filter baked in
    cat.append("sales", sales(30), 2000L)
    eng.sql("REFRESH MATERIALIZED VIEW big_mv")
    val refreshed = eng.sql(q)
    assert(readsFrom(refreshed, "big_mv"))
    val want2 = cat.table("sales").filter($"amount" > 30).groupBy($"grp")
      .agg(count(lit(1)).as("cnt"), sum($"amount").as("total"))
      .orderBy($"grp").collect().toSeq
    assert(refreshed.collect().toSeq == want2)
    // a different predicate — or none — cannot use the partial state
    assert(readsFrom(eng.sql("SELECT grp, count(*) AS cnt FROM sales " +
      "WHERE amount > 40 GROUP BY grp"), "sales"))
    assert(readsFrom(eng.sql("SELECT grp, count(*) AS cnt FROM sales " +
      "GROUP BY grp"), "sales"))
  }

  test("GLOBAL (ungrouped) aggregates merge the whole state") {
    val (cat, eng) = build()
    val viaMv = eng.sql("SELECT count(*) AS cnt, sum(amount) AS total, " +
      "avg(amount) AS mean, count(DISTINCT grp) AS groups FROM sales")
    assert(readsFrom(viaMv, "sales_mv"))
    val want = cat.table("sales")
      .agg(count(lit(1)).as("cnt"), sum($"amount").as("total"),
        avg($"amount").as("mean"), countDistinct($"grp").as("groups"))
      .collect().toSeq
    assert(viaMv.collect().toSeq == want)
  }

  test("COUNT(DISTINCT group-col) derives exactly from state rows") {
    val (cat, eng) = build()
    val viaMv = eng.sql("SELECT grp, count(DISTINCT region) AS regions, " +
      "count(*) AS cnt FROM sales GROUP BY grp ORDER BY grp")
    assert(readsFrom(viaMv, "sales_mv"))
    val want = cat.table("sales").groupBy($"grp")
      .agg(countDistinct($"region").as("regions"), count(lit(1)).as("cnt"))
      .orderBy($"grp").collect().toSeq
    assert(viaMv.collect().toSeq == want)
  }

  test("non-derivable shapes fall through: distinct aggs on non-group " +
      "cols, unknown order keys, missing group col in SELECT") {
    val (_, eng) = build()
    assert(readsFrom(eng.sql(
      "SELECT grp, count(DISTINCT id) AS r FROM sales GROUP BY grp"),
      "sales"))
    assert(readsFrom(eng.sql(
      "SELECT grp, count(*) AS cnt FROM sales GROUP BY grp ORDER BY max(id)"),
      "sales"))
    assert(readsFrom(eng.sql(
      "SELECT count(*) AS cnt FROM sales GROUP BY grp"),
      "sales"))
  }
}
