package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.store.{MaterializedView => MV}

/** APPROX_COUNT_DISTINCT in materialized views: NDV state is a
  * DataSketches HLL sketch (binary, mergeable), so the one distinct
  * form an incremental view CAN maintain refreshes delta-only — exact
  * COUNT(DISTINCT) state cannot merge, which is why the MV grammar
  * rejects it off group columns. At test cardinalities (< 512 per
  * group) the sketch is in exact (coupon) mode, so every assertion is
  * deterministic equality against the true distinct count.
  */
class MvApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture(): (graft.catalog.GraftCatalog, graft.sql.Engine) = {
    val cat = new graft.catalog.GraftCatalog(
      Files.createTempDirectory("graft-mvhll"), spark)
    cat.createDatabase("default")
    (cat, new graft.sql.Engine(cat))
  }

  /** id repeats across rows (i % 40): distinct counts differ from row
    * counts, and appended deltas OVERLAP the base's ids — the case
    * where "just add the counts" would be wrong and only a mergeable
    * sketch (or a rescan) answers. */
  private def visits(n: Int, offset: Int = 0): DataFrame =
    (offset until offset + n)
      .map(i => (i % 40, s"grp${i % 3}"))
      .toDF("visitor", "grp")

  private def exact(st: TableStore, base: String): Map[String, Long] =
    st.read(base).groupBy($"grp")
      .agg(countDistinct($"visitor").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def rendered(st: TableStore, name: String): Map[String, Long] =
    MV.read(st, name).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("create + incremental refresh track exact NDV through overlapping deltas") {
    val (cat, _) = fixture()
    val st = cat.store()
    cat.createTable("visits", visits(1).schema)
    cat.append("visits", visits(30), 1000L)
    MV.create(st, "mv_nd", MV.MvDef("visits", Seq("grp"),
      Seq(MV.AggSpec("approx_count_distinct", Some("visitor"), "nd"))))
    assert(rendered(st, "mv_nd") == exact(st, "visits"))

    // delta overlaps the base's visitor ids: counts must NOT double
    cat.append("visits", visits(50, offset = 10).repartition(2), 2000L)
    MV.plan(st, "mv_nd") match {
      case MV.Incremental(files, _) => assert(files == 2)
      case other => fail(s"expected Incremental, got $other")
    }
    MV.refresh(st, "mv_nd")
    assert(st.currentSummary("mv_nd")("mv-refresh") == "incremental")
    assert(rendered(st, "mv_nd") == exact(st, "visits"))
  }

  test("delete forces a full rebuild and stays exact") {
    val (cat, _) = fixture()
    val st = cat.store()
    cat.createTable("visits", visits(1).schema)
    cat.append("visits", visits(60), 1000L)
    MV.create(st, "mv_nd2", MV.MvDef("visits", Seq("grp"),
      Seq(MV.AggSpec("approx_count_distinct", Some("visitor"), "nd"))))
    st.deleteWhere("visits", col("visitor") >= 20)
    MV.plan(st, "mv_nd2") match {
      case MV.FullRebuild(reason, _) => assert(reason.contains("delete"))
      case other => fail(s"expected FullRebuild, got $other")
    }
    MV.refresh(st, "mv_nd2")
    assert(rendered(st, "mv_nd2") == exact(st, "visits"))
  }

  test("SQL surface: CREATE with APPROX_COUNT_DISTINCT; rewrite serves " +
      "coarser groups by sketch union; SHOW CREATE round-trips") {
    val (cat, eng) = fixture()
    val st = cat.store()
    cat.createTable("visits",
      visits(1).withColumn("region", lit("r")).schema)
    cat.append("visits", (0 until 90)
      .map(i => (i % 40, s"grp${i % 3}", s"reg${i % 2}"))
      .toDF("visitor", "grp", "region"), 1000L)
    eng.sql("CREATE MATERIALIZED VIEW visits_mv AS SELECT grp, region, " +
      "approx_count_distinct(visitor) AS nd FROM visits GROUP BY grp, region")

    // coarser grouping than the view: per-(grp, region) sketches union
    // into per-grp sketches — answered from the VIEW's files
    val viaMv = eng.sql("SELECT grp, approx_count_distinct(visitor) AS nd " +
      "FROM visits GROUP BY grp ORDER BY grp")
    val files = viaMv.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/visits_mv/")),
      "expected the view to answer")
    val want = st.read("visits").groupBy($"grp")
      .agg(countDistinct($"visitor").as("nd")).orderBy($"grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaMv.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == want)

    val ddl = eng.sql("SHOW CREATE TABLE visits_mv").head().getString(0)
    assert(ddl.contains("approx_count_distinct(visitor) AS nd"))
  }

  test("exact COUNT(DISTINCT) off a group column is still rejected") {
    val (cat, eng) = fixture()
    cat.createTable("visits", visits(1).schema)
    cat.append("visits", visits(10), 1000L)
    val e = intercept[IllegalArgumentException](
      eng.sql("CREATE MATERIALIZED VIEW bad_mv AS SELECT grp, " +
        "count(DISTINCT visitor) AS nd FROM visits GROUP BY grp"))
    assert(e.getMessage.toLowerCase.contains("approx_count_distinct"))
  }
}
