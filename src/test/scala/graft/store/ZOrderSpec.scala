package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Z-order clustering: the rewrite must preserve rows exactly, and the
  * re-clustered layout must let the EXISTING per-file stats pruning skip
  * files for box predicates on any subset of the z columns — the
  * multi-dimensional analogue of what sorted tables buy on one key.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def newStore(): TableStore =
    new TableStore(new HPath(Files.createTempDirectory("graft-z").toUri), spark)

  test("zvalue interleaves rank bits into Morton codes") {
    val cases = Seq( // ((r0, r1), expected z) for k=2
      ((0, 0), 0L), ((0, 1), 1L), ((1, 0), 2L), ((1, 1), 3L),
      ((3, 3), 15L), ((0, 255), 0x5555L), ((255, 0), 0xAAAAL),
      ((255, 255), 0xFFFFL))
    val got = cases.map { case ((a, b), _) =>
      spark.range(1).select(ZOrder.zvalue(Seq(lit(a), lit(b))))
        .head().getLong(0)
    }
    assert(got == cases.map(_._2))
    // one column degenerates to the rank itself
    assert(spark.range(1).select(ZOrder.zvalue(Seq(lit(200))))
      .head().getLong(0) == 200L)
  }

  test("rank counts boundaries at or below the value; nulls rank 0") {
    val bs = Seq(10, 20, 30)
    val df = Seq(Some(5), Some(10), Some(25), Some(35), None).toDF("v")
    val ranks = df.select(ZOrder.rank(col("v"), bs)).collect().map(_.getInt(0))
    assert(ranks.toSeq == Seq(0, 1, 2, 3, 0))
    // empty boundaries (all-null sample column): constant rank
    assert(df.select(ZOrder.rank(col("v"), Seq.empty))
      .collect().map(_.getInt(0)).forall(_ == 0))
  }

  test("z-order rewrite preserves rows and enables 2-D file skipping") {
    val st = newStore()
    // 64x64 grid scattered hash-randomly across 16 files: every file
    // spans the full range of both axes, so nothing can prune
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).cast("int").as("x"),
        (col("id") / 64).cast("int").as("y"),
        col("id").as("payload"))
      .repartition(16)
    st.create("zt", grid.schema)
    st.append("zt", grid, 1000L)
    val before = st.dataFilesAsOf("zt", None)
    assert(before.size >= 8)
    val box = col("x") >= 8 && col("x") <= 15 && col("y") >= 8 && col("y") <= 15
    assert(st.prunedFiles("zt", box).size == before.size,
      "random layout: every file intersects the box")

    // force a multi-file rewrite on tiny data: target ~1/16 of the bytes
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val bytes = st.currentFiles("zt")
      .map(f => fs.getFileStatus(new HPath(f)).getLen).sum
    val snap = st.zorder("zt", Seq("x", "y"),
      targetBytes = math.max(1L, bytes / 16))
    assert(snap.summary("zorder-by") == "x,y")
    val after = st.dataFilesAsOf("zt", None)
    assert(after.size >= 8, s"expected a multi-file z layout, got ${after.size}")

    // rows exactly preserved
    assert(st.read("zt").orderBy("payload").select("payload").as[Long]
      .collect().toSeq == (0L until 64 * 64))
    // the 8x8 box now prunes to a small corner of the files
    // the box covers 1/64 of the value space; unaligned file boundaries
    // make a handful of straddlers inevitable, but ~2/3 of the files
    // must skip (the random layout skipped zero)
    val keptBox = st.prunedFiles("zt", box).size
    assert(keptBox <= math.max(4, after.size / 3),
      s"2-D box kept $keptBox of ${after.size} files")
    // a predicate on the SECOND dimension alone also skips — the thing
    // a linear sort on x could never give y
    // the band is 1/4 of y-space; unaligned boundaries add straddlers,
    // but at least a third of the files must skip (random layout: zero)
    val keptY = st.prunedFiles("zt", col("y") >= 0 && col("y") <= 15).size
    assert(keptY <= after.size * 2 / 3,
      s"y-band kept $keptY of ${after.size} files")
    // time travel still sees the pre-rewrite layout
    assert(st.read("zt", Some(1500L)).count() == 64L * 64)
  }

  test("z-order composes with hidden partitioning: dirs own placement, z owns within") {
    val st = newStore()
    val data = spark.range(3000).select(
      (col("id") % 40).cast("int").as("a"),
      ((col("id") / 40) % 50).cast("int").as("b"),
      to_date(concat(lit("2024-0"),
        (col("id") % 3 + 1).cast("string"), lit("-15"))).as("d"))
    st.create("zp", data.schema, Some(PartitionSpec("d", "month")))
    st.append("zp", data.repartition(6), 1000L)
    st.zorder("zp", Seq("a", "b"), targetBytes = 4096)
    val files = st.dataFilesAsOf("zp", None)
    // every rewritten file still carries its month partition value
    assert(files.forall(_.partition.contains("d")))
    assert(files.flatMap(_.partition.get("d")).toSet ==
      Set("2024-01", "2024-02", "2024-03"))
    // partition pruning intact after the rewrite
    val feb = st.prunedFiles("zp",
      col("d") === lit(java.sql.Date.valueOf("2024-02-15")))
    assert(feb.nonEmpty &&
      feb.forall(_.partition.get("d").contains("2024-02")))
    // rows exactly preserved
    assert(st.read("zp").count() == 3000)
    assert(st.read("zp").agg(sum(col("a")), sum(col("b"))).head() ==
      data.agg(sum(col("a")), sum(col("b"))).head())
  }

  test("z-order of an empty table commits an empty replace, not a crash") {
    val st = newStore()
    st.create("e", Seq((1, 2)).toDF("a", "b").schema)
    val snap = st.zorder("e", Seq("a", "b"))
    assert(snap.operation == "replace" && snap.recordCount == 0)
    assert(st.read("e").count() == 0)
  }

  test("z-order rejects layouts owned by other mechanisms") {
    val st = newStore()
    val df = Seq((1, "a")).toDF("id", "v")
    st.create("s", df.schema, None, sortBy = Seq("id"))
    st.append("s", df, 1000L)
    assert(intercept[IllegalArgumentException](
      st.zorder("s", Seq("id"))).getMessage.contains("SORTED BY"))

    st.create("b", df.schema, Some(PartitionSpec("id", "bucket", Some(4))))
    st.append("b", df, 1000L)
    assert(intercept[IllegalArgumentException](
      st.zorder("b", Seq("id"))).getMessage.contains("bucket"))

    st.create("p", df.schema)
    st.append("p", df, 1000L)
    assert(intercept[IllegalArgumentException](
      st.zorder("p", Seq("nope"))).getMessage.contains("not in schema"))
    assert(intercept[IllegalArgumentException](
      st.zorder("p", Seq.empty)).getMessage.contains("1.."))
  }

  test("OPTIMIZE t ZORDER BY (a, b) routes through SQL") {
    val cat = new graft.catalog.GraftCatalog(
      Files.createTempDirectory("graft-zsql"), spark)
    cat.createDatabase("default")
    val eng = new graft.sql.Engine(cat)
    val grid = spark.range(256)
      .select((col("id") % 16).cast("int").as("a"),
        (col("id") / 16).cast("int").as("b"))
      .repartition(4)
    cat.createTable("zs", grid.schema)
    cat.append("zs", grid, 1000L)
    assert(eng.run("OPTIMIZE zs ZORDER BY (a, b)") == "[]")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val snap = SnapshotLog.read(fs, cat.store().tableDir("zs")).last
    assert(snap.operation == "replace" &&
      snap.summary("zorder-by") == "a,b")
    assert(cat.table("zs").count() == 256)
    // plain OPTIMIZE still bin-packs
    assert(eng.run("OPTIMIZE zs") == "[]")
    assert(cat.table("zs").count() == 256)

    // Iceberg's procedure spelling of the same rewrites
    assert(eng.run("CALL system.rewrite_data_files(table => 'zs', " +
      "strategy => 'sort', sort_order => 'zorder(a, b)')") == "[]")
    val snaps = SnapshotLog.read(fs, cat.store().tableDir("zs"))
    assert(snaps.last.summary("zorder-by") == "a,b")
    assert(eng.run("CALL system.rewrite_data_files(table => 'zs', " +
      "strategy => 'sort', sort_order => 'a')") == "[]")
    assert(SnapshotLog.read(fs, cat.store().tableDir("zs"))
      .last.summary("sorted-by") == "a")
    assert(cat.table("zs").count() == 256)
    val bad = intercept[IllegalArgumentException](
      eng.run("CALL rewrite_data_files(table => 'zs', strategy => 'shuffle')"))
    assert(bad.getMessage.contains("unknown strategy"))
  }
}
