package graft.present

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.catalog.GraftCatalog

/** Result post-processing operators (SURVEY.md §2.9): plot decision
  * rules (`/root/reference/app-gradio.py:195-228`), summarizer templates
  * (`/root/reference/app-gradio.py:263-272`), markdown tables
  * (`/root/reference/all_in_one_PC.py:117-135`), schema introspection
  * (`/root/reference/app-gradio.py:86-87`).
  */
class PresentSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val twoColNumeric = StructType(Seq(
    StructField("plan_type", StringType),
    StructField("revenue", DoubleType)))

  // ---- PlotDecider ----------------------------------------------------

  test("single row is not plottable") {
    assert(!PlotDecider.decide(twoColNumeric, 1, "total?").plottable)
  }

  test("single column is not plottable") {
    val s = StructType(Seq(StructField("cnt", LongType)))
    assert(!PlotDecider.decide(s, 5, "count?").plottable)
  }

  test("non-numeric second column is not plottable") {
    val s = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    assert(!PlotDecider.decide(s, 5, "list them").plottable)
  }

  test("2+ rows with numeric second column plot as a bar by default") {
    val d = PlotDecider.decide(twoColNumeric, 10, "revenue by plan type?")
    assert(d.plottable && d.chartType == "bar")
    assert(d.xLabel == "plan_type" && d.yLabel == "revenue")
    assert(d.title == "revenue by plan type") // '?' stripped
  }

  test("comparison questions with few categories plot as a pie") {
    val d = PlotDecider.decide(twoColNumeric, 2,
      "Compare total revenue between prepaid and postpaid plans")
    assert(d.chartType == "pie")
  }

  test("comparison questions with many categories fall back to bar") {
    assert(PlotDecider.decide(twoColNumeric, 20, "compare revenue").chartType == "bar")
  }

  test("truncateForPlot keeps the first two columns") {
    val df = Seq((1, 2.0, "x")).toDF("a", "b", "c")
    assert(PlotDecider.truncateForPlot(df).columns.toSeq == Seq("a", "b"))
    val two = Seq((1, 2.0)).toDF("a", "b")
    assert(PlotDecider.truncateForPlot(two).columns.toSeq == Seq("a", "b"))
  }

  test("toJson escapes quotes and backslashes") {
    val d = PlotDecision(plottable = true, "bar", "a \"b\" \\ c", "x", "y")
    assert(PlotDecider.toJson(d).contains("\"a \\\"b\\\" \\\\ c\""))
  }

  // ---- Summarizer -----------------------------------------------------

  test("empty result gets the no-records answer") {
    assert(Summarizer.summarize("how many?", "[]") ==
      "There are no matching records for your question.")
  }

  test("scalar tuple is extracted (the reference's tuple-extraction rule)") {
    assert(Summarizer.summarize("how many?", "[(131,)]") ==
      "The answer to your question is: 131.")
    assert(Summarizer.summarize("which?", "[('Postpaid',)]") ==
      "The answer to your question is: Postpaid.")
    assert(Summarizer.summarize("avg?", "[(3.25,)]") ==
      "The answer to your question is: 3.25.")
  }

  test("multi-row results are counted") {
    val s = Summarizer.summarize("list", "[(1, 'a'), (2, 'b')]")
    assert(s.startsWith("Your query returned 2 rows:"))
    val one = Summarizer.summarize("list", "[(1, 'a b c')]")
    assert(one.startsWith("Your query returned 1 row:"))
  }

  test("row counting ignores parentheses inside string values") {
    assert(Summarizer.countRows("[('a (weird) value', 1), (2, 'x')]") == 2)
  }

  // ---- MarkdownTable --------------------------------------------------

  test("markdown table aligns columns and renders NULL") {
    val out = MarkdownTable.render(
      Array("name", "n"),
      Array(Row("alpha", 1), Row(null, 22)))
    val expected =
      """#| name  | n  |
         #| ----- | -- |
         #| alpha | 1  |
         #| NULL  | 22 |""".stripMargin('#')
    assert(out == expected)
  }

  // ---- Introspector ---------------------------------------------------

  test("tableInfo emits DDL plus sample rows, honoring the allow-list") {
    val cat = new GraftCatalog(Files.createTempDirectory("graft-intro"), spark)
    cat.createDatabase("default")
    val df = Seq((1, "a"), (2, null.asInstanceOf[String])).toDF("id", "name")
    cat.createTable("items", df.schema)
    cat.append("items", df, 1000L)
    cat.createTable("hidden", df.schema)
    cat.append("hidden", df, 1000L)

    val intro = new Introspector(cat, includeTables = Some(Seq("items")), sampleRows = 10)
    assert(intro.tables == Seq("items"))
    val info = intro.tableInfo
    assert(info.contains("CREATE TABLE items"))
    assert(info.contains("id INT"))
    assert(info.contains("10 rows from items table:"))
    assert(info.contains("id\tname"))
    assert(info.contains("None")) // null sample renders Python-style
    assert(!info.contains("hidden"))
    // no stats computed yet → no stats block
    assert(!info.contains("stats ("))

    // once COMPUTE STATS runs, the block rides along (no extra scan:
    // read from the persisted stats.json)
    graft.store.TableStats.compute(cat.store(), "items", exactNdv = true)
    val withStats = intro.tableInfo
    assert(withStats.contains("stats (2 rows):"))
    assert(withStats.contains("id: ndv=2 nulls=0 range=[1, 2]"))
    assert(withStats.contains("name: ndv=1 nulls=1"))
  }
}
