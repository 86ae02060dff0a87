package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.store.TableStore

/** The DSv2 `graft-table` streaming source: snapshot tables as
  * first-class `spark.readStream` sources over the incremental append
  * scan — the table-as-stream direction the reference's append workflow
  * implies (`/root/reference/append_iceberg.py:182-215`).
  */
class TableStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def mkWarehouse(): (String, TableStore) = {
    val wh = Files.createTempDirectory("graft-wh").toUri.toString
    (wh, new TableStore(new HPath(new HPath(wh), "default"), spark))
  }

  private def reader(wh: String, table: String) =
    spark.readStream.format("graft-table")
      .option("warehouse", wh).option("table", table)

  test("micro-batches deliver appends exactly once, in commit order") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    st.append("ev", (1 to 5).toDF("id"), 1000L)
    val q = reader(wh, "ev").load().writeStream
      .format("memory").queryName("tss_basic").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tss_basic").as[Int].collect().sorted.toSeq == (1 to 5))
      st.append("ev", (6 to 9).toDF("id"), 2000L)
      st.append("ev", (10 to 12).toDF("id"), 3000L)
      q.processAllAvailable()
      // every row exactly once — no re-read of the base on later batches
      assert(spark.table("tss_basic").as[Int].collect().sorted.toSeq == (1 to 12))
    } finally q.stop()
  }

  test("INT96-written timestamp columns stream correctly (legacy writer " +
      "sessions must not produce unreadable tables)") {
    val (wh, st) = mkWarehouse()
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      val rows = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        (2L, java.sql.Timestamp.valueOf("2024-02-03 23:59:59")))
        .toDF("id", "ts")
      st.create("ev96", rows.schema)
      st.append("ev96", rows, 1000L)
      val q = reader(wh, "ev96").load().writeStream
        .format("memory").queryName("tss_int96").outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("tss_int96")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString))
          .sortBy(_._1).toSeq
        assert(got == Seq((1L, "2024-01-01 10:00:00.0"),
          (2L, "2024-02-03 23:59:59.0")))
      } finally q.stop()
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  test("startAfterSnapshotId skips history before the cursor") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    val s1 = st.append("ev", (1 to 5).toDF("id"), 1000L)
    st.append("ev", (6 to 8).toDF("id"), 2000L)
    val q = reader(wh, "ev").option("startAfterSnapshotId", s1.id.toString)
      .load().writeStream
      .format("memory").queryName("tss_cursor").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tss_cursor").as[Int].collect().sorted.toSeq == (6 to 8))
    } finally q.stop()
  }

  test("restart from checkpoint resumes exactly-once after the committed offset") {
    val (wh, st) = mkWarehouse()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    st.create("ev", (1 to 1).toDF("id").schema)
    st.append("ev", (1 to 5).toDF("id"), 1000L)
    val run1 = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q1 = reader(wh, "ev").load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r => run1.add(r.getInt(0)))
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q1.processAllAvailable()
      assert(run1.asScala.toSeq.sorted == (1 to 5))
    } finally q1.stop()

    st.append("ev", (6 to 9).toDF("id"), 2000L)
    // Fresh collector, same checkpoint: only the NEW snapshot arrives —
    // the committed offset (not startAfterSnapshotId=0) drives the resume.
    val run2 = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q2 = reader(wh, "ev").load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r => run2.add(r.getInt(0)))
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      assert(run2.asScala.toSeq.sorted == (6 to 9))
    } finally q2.stop()
  }

  test("a rewrite snapshot inside the planned range fails the stream") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    st.append("ev", (1 to 5).toDF("id"), 1000L)
    val q = reader(wh, "ev").load().writeStream
      .format("memory").queryName("tss_rewrite").outputMode("append").start()
    try {
      q.processAllAvailable()
      st.deleteWhere("ev", col("id") === 3, 2000L) // rewrite snapshot
      st.append("ev", (6 to 7).toDF("id"), 3000L)
      val ex = intercept[StreamingQueryException] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("non-append")))
    } finally q.stop()
  }

  test("watermarked windowed aggregation composes on top of the source") {
    val (wh, st) = mkWarehouse()
    def batch(rows: Seq[(String, Int)]) =
      rows.toDF("t", "v").select(to_timestamp($"t").as("ts"), $"v")
    st.create("ev", batch(Seq(("2024-01-01 00:00:00", 0))).schema)
    st.append("ev", batch(Seq(
      ("2024-01-01 00:05:00", 1), ("2024-01-01 00:20:00", 2),
      ("2024-01-01 01:10:00", 10))), 1000L)
    val q = reader(wh, "ev").load()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour")).agg(sum($"v").as("s"))
      .writeStream.format("memory").queryName("tss_window")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      st.append("ev", batch(Seq(("2024-01-01 01:30:00", 20))), 2000L)
      q.processAllAvailable()
      val got = spark.table("tss_window")
        .select(date_format($"window.start", "HH:mm").as("h"), $"s")
        .as[(String, Long)].collect().groupBy(_._1)
        // update mode re-emits a window per refinement — last write wins
        .map { case (h, vs) => h -> vs.last._2 }
      assert(got == Map("00:00" -> 3L, "01:00" -> 30L))
    } finally q.stop()
  }

  test("maxFilesPerTrigger chunks a deep backlog into bounded micro-batches") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    // 4 append snapshots of one file each, committed before the stream starts
    (0 until 4).foreach(i => st.append("ev",
      Seq(i * 10).toDF("id").coalesce(1), 1000L * (i + 1)))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = reader(wh, "ev").option("maxFilesPerTrigger", "1").load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = df.count().toInt
        if (n > 0) batches.add(n)
        ()
      }.start()
    try {
      q.processAllAvailable()
      // the backlog drains one snapshot (one file) per batch, not in one go
      assert(batches.asScala.toSeq == Seq(1, 1, 1, 1))
    } finally q.stop()
  }

  test("maxRowsPerTrigger budgets batches by the log's row deltas") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    // three snapshots of 2 rows each; a 3-row budget admits exactly one
    // snapshot per batch (the second would bust the remaining budget)
    (0 until 3).foreach(i => st.append("ev",
      Seq(i * 10, i * 10 + 1).toDF("id").coalesce(1), 1000L * (i + 1)))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = reader(wh, "ev").option("maxRowsPerTrigger", "3").load().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = df.count().toInt
        if (n > 0) batches.add(n)
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.asScala.toSeq == Seq(2, 2, 2))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the committed backlog and stops") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    st.append("ev", (1 to 3).toDF("id"), 1000L)
    st.append("ev", (4 to 5).toDF("id"), 2000L)
    val q = reader(wh, "ev").option("maxFilesPerTrigger", "1").load().writeStream
      .format("memory").queryName("tss_avnow").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query did not stop")
      assert(spark.table("tss_avnow").as[Int].collect().sorted.toSeq == (1 to 5))
    } finally q.stop()
  }

  test("column pruning reaches the stream scan; count(*) survives it") {
    val (wh, st) = mkWarehouse()
    st.create("ev", Seq((1, "a", 1.0)).toDF("id", "tag", "w").schema)
    st.append("ev", Seq((1, "x", 0.5), (2, "y", 1.5)).toDF("id", "tag", "w"), 1000L)
    // projection of one column: the scan must plan with the pruned schema
    val q = reader(wh, "ev").load().select("tag").writeStream
      .format("memory").queryName("tss_prune").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tss_prune").as[String].collect().sorted.toSeq ==
        Seq("x", "y"))
      val scans = q.lastProgress.sources
      assert(scans.nonEmpty)
    } finally q.stop()
    // empty projection (count) still bills every row
    val qc = reader(wh, "ev").load().groupBy().count().writeStream
      .format("memory").queryName("tss_count").outputMode("complete").start()
    try {
      qc.processAllAvailable()
      assert(spark.table("tss_count").as[Long].head() == 2L)
    } finally qc.stop()
  }

  test("projecting only a column newer than a file yields its rows as nulls") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    st.append("ev", (1 to 3).toDF("id"), 1000L)
    st.addColumns("ev", StructType(Seq(StructField("tag", StringType))))
    st.append("ev", Seq((4, "x")).toDF("id", "tag"), 2000L)
    // the old file contains NO requested column: its 3 rows must still
    // surface (as nulls), not vanish
    val q = reader(wh, "ev").load().select("tag").writeStream
      .format("memory").queryName("tss_newcol").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tss_newcol").as[Option[String]].collect().toSeq
      assert(got.count(_.isEmpty) == 3 && got.flatten.sorted == Seq("x"))
    } finally q.stop()
  }

  test("partition reader decodes only the requested columns") {
    val dir = Files.createTempDirectory("graft-prune").resolve("t").toString
    Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "tag", "w")
      .coalesce(1).write.parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val pruned = StructType(Seq(StructField("tag", StringType)))
    val r = new GraftPartitionReader(file, pruned)
    try {
      val out = Iterator.continually(r)
        .takeWhile(_.next()).map(_.get().getUTF8String(0).toString).toList
      assert(out.sorted == List("a", "b"))
    } finally r.close()
  }

  test("where option prunes non-matching partitions' delta files from each batch") {
    val (wh, st) = mkWarehouse()
    val schema = Seq(("a", 1)).toDF("k", "v").schema
    st.create("ev", schema, Some(graft.store.PartitionSpec("k", "identity")))
    // two partitions per append: the a-scoped stream must plan (and
    // bill) only partition a's files — observable as source input rows
    st.append("ev", Seq(("a", 1), ("a", 2), ("b", 10)).toDF("k", "v"), 1000L)
    val q = reader(wh, "ev").option("where", "k = 'a'").load()
      .filter($"k" === "a") // residual: file pruning is conservative
      .writeStream.format("memory").queryName("tss_where")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      st.append("ev", Seq(("a", 3), ("b", 20), ("b", 30)).toDF("k", "v"), 2000L)
      q.processAllAvailable()
      assert(spark.table("tss_where").as[(String, Int)].collect().sorted.toSeq ==
        Seq(("a", 1), ("a", 2), ("a", 3)))
      // pruned at the FILE level: partition b's 3 rows never entered the
      // scan (with no pruning, input rows would be 6)
      val inputRows = q.recentProgress.map(_.numInputRows).sum
      assert(inputRows == 3, s"expected 3 source rows after pruning, got $inputRows")
    } finally q.stop()
  }

  test("where option alone is row-exact on a partially-matching file") {
    val (wh, st) = mkWarehouse()
    val schema = Seq(("a", 1)).toDF("k", "v").schema
    st.create("ev", schema)
    // ONE file holding both matching and non-matching rows: file-level
    // pruning cannot separate them, so exactness must come from the
    // reader's row-level predicate — no residual .filter in the query
    st.append("ev", Seq(("a", 1), ("b", 10), ("a", 2), ("b", 20))
      .toDF("k", "v").coalesce(1), 1000L)
    val q = reader(wh, "ev").option("where", "k = 'a'").load()
      .writeStream.format("memory").queryName("tss_where_exact")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tss_where_exact").as[(String, Int)]
        .collect().sorted.toSeq == Seq(("a", 1), ("a", 2)))
    } finally q.stop()

    // `where` on a column OUTSIDE `columns`: the reader decodes v
    // internally for the predicate but emits only k
    val q2 = reader(wh, "ev").option("where", "v >= 10")
      .option("columns", "k").load()
      .writeStream.format("memory").queryName("tss_where_extra")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val out = spark.table("tss_where_extra")
      assert(out.schema.fieldNames.toSeq == Seq("k"))
      assert(out.as[String].collect().sorted.toSeq == Seq("b", "b"))
    } finally q2.stop()
  }

  test("pushFilters prunes planned partitions; every filter stays residual") {
    val (wh, st) = mkWarehouse()
    val schema = Seq(("a", 1)).toDF("k", "v").schema
    st.create("ev", schema, Some(graft.store.PartitionSpec("k", "identity")))
    // one writer task → exactly one file per partition value
    st.append("ev", Seq(("a", 1), ("a", 2), ("b", 10)).toDF("k", "v").coalesce(1), 1000L)
    val latest = st.currentSnapshotId("ev").get
    val opts = new java.util.HashMap[String, String]()
    opts.put("warehouse", wh); opts.put("table", "ev")
    val builder = new GraftStreamTable(schema, GraftStreamOptions(opts))
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    val filters: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.EqualTo("k", "a"))
    val residual = builder
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(filters)
    assert(residual.toSeq == filters.toSeq) // conservative: engine re-applies all
    val stream = builder.build().toMicroBatchStream("unused")
    val parts = stream.planInputPartitions(GraftOffset(0L), GraftOffset(latest))
    assert(parts.length == 1, s"expected only partition a's file, got ${parts.length}")
    // unfiltered builder plans both partitions' files
    val all = new GraftStreamTable(schema, GraftStreamOptions(opts))
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toMicroBatchStream("unused")
      .planInputPartitions(GraftOffset(0L), GraftOffset(latest))
    assert(all.length == 2)
  }

  test("skipRewrites resumes past a compaction, delivering only append deltas") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    st.append("ev", (1 to 5).toDF("id"), 1000L)
    val q = reader(wh, "ev").option("skipRewrites", "true").load().writeStream
      .format("memory").queryName("tss_skiprw").outputMode("append").start()
    try {
      q.processAllAvailable()
      st.compact("ev") // rewrite snapshot — fatal without the option
      st.append("ev", (6 to 8).toDF("id"), 3000L)
      q.processAllAvailable()
      // the compaction's rewritten base rows are NOT re-delivered; the
      // post-compact append arrives normally
      assert(spark.table("tss_skiprw").as[Int].collect().sorted.toSeq == (1 to 8))
    } finally q.stop()
  }

  test("columns option narrows the SOURCE schema: the scan decodes only them") {
    val (wh, st) = mkWarehouse()
    st.create("ev", Seq((1, "a", 1.0)).toDF("id", "tag", "w").schema)
    st.append("ev", Seq((1, "x", 0.5), (2, "y", 1.5)).toDF("id", "tag", "w"), 1000L)
    val q = reader(wh, "ev").option("columns", "tag").load().writeStream
      .format("memory").queryName("tss_cols").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tss_cols").schema.fieldNames.toSeq == Seq("tag"))
      assert(spark.table("tss_cols").as[String].collect().sorted.toSeq ==
        Seq("x", "y"))
      // the MicroBatchScan itself outputs ONLY the requested column —
      // Spark's planner never calls pruneColumns on streaming scans, so
      // without the option the scan would carry all three
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { q.explain() }
      val scanLine = out.toString.linesIterator
        .find(_.contains("MicroBatchScan")).getOrElse("")
      assert(scanLine.contains("tag#") && !scanLine.contains("id#") &&
        !scanLine.contains("w#"), scanLine)
    } finally q.stop()
    // unknown column names fail at planning, not silently
    val bad = intercept[Exception] {
      reader(wh, "ev").option("columns", "nope").load()
    }
    assert(bad.getMessage.contains("nope"))
  }

  test("one footer open serves probe and vectorized read per streamed file") {
    val dir = Files.createTempDirectory("graft-footer").resolve("t").toString
    Seq((1, "a"), (2, "b")).toDF("id", "tag").coalesce(1).write.parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val before = GraftPartitionReader.footerOpens.get()
    val r = new GraftPartitionReader(file,
      Seq((1, "a")).toDF("id", "tag").schema)
    try {
      val out = Iterator.continually(r)
        .takeWhile(_.next()).map(_.get().getInt(0)).toList
      assert(out.sorted == List(1, 2))
    } finally r.close()
    assert(GraftPartitionReader.footerOpens.get() - before == 1)
  }

  test("renamed column streams correctly from pre-rename files") {
    val (wh, st) = mkWarehouse()
    st.create("ev", Seq((1, "a")).toDF("id", "tag").schema)
    st.append("ev", Seq((1, "x"), (2, "y")).toDF("id", "tag"), 1000L)
    st.renameColumn("ev", "tag", "label")
    st.append("ev", Seq((3, "z")).toDF("id", "label"), 2000L)
    // one stream spans files written under BOTH physical names — the
    // old files must deliver values under the new name, not nulls
    val q = reader(wh, "ev").load().writeStream
      .format("memory").queryName("tss_rename").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tss_rename").as[(Int, String)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq((1, "x"), (2, "y"), (3, "z")))
    } finally q.stop()
  }

  test("widened column streams correctly from pre-widening int32 files") {
    val (wh, st) = mkWarehouse()
    st.create("ev", Seq((1, 100)).toDF("id", "n").schema) // n: INT
    st.append("ev", Seq((1, 100), (2, 200)).toDF("id", "n"), 1000L)
    st.widenColumn("ev", "n", org.apache.spark.sql.types.LongType)
    st.append("ev", Seq((3L, 5000000000L)).toDF("id", "n")
      .select(col("id").cast("int").as("id"), col("n")), 2000L)
    val q = reader(wh, "ev").load().writeStream
      .format("memory").queryName("tss_widen").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tss_widen").as[(Int, Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq((1, 100L), (2, 200L), (3, 5000000000L)))
    } finally q.stop()
  }

  test("where + columns compose across rename-then-widen on pre-evolution files") {
    val (wh, st) = mkWarehouse()
    // file 1 predates BOTH evolutions: physical column name "n", int32
    st.create("ev", Seq((1, 100, "a")).toDF("id", "n", "tag").schema)
    st.append("ev", Seq((1, 100, "x"), (2, 200, "y"), (3, 300, "z"))
      .toDF("id", "n", "tag").coalesce(1), 1000L)
    st.renameColumn("ev", "n", "amount")
    st.widenColumn("ev", "amount", org.apache.spark.sql.types.LongType)
    // file 2 is post-evolution: physical "amount", int64
    st.append("ev", Seq((4, 5000000000L, "w")).toDF("id", "amount", "tag")
      .select(col("id").cast("int").as("id"), col("amount"), col("tag")), 2000L)
    // predicate on the CURRENT name, over a predicate-ONLY column (not
    // in `columns`): the reader's row-level evaluation must bind it
    // through the rename chain AND the widen on the pre-evolution file
    // — the risky seam where the scan schema is extended with
    // predicate-only columns — and stay row-exact (file 1 mixes
    // matching and non-matching rows, so file pruning can't save it)
    val q = reader(wh, "ev").option("where", "amount >= 200")
      .option("columns", "id,tag").load()
      .writeStream.format("memory").queryName("tss_where_evo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("tss_where_evo")
      assert(out.schema.fieldNames.toSeq == Seq("id", "tag"))
      assert(out.as[(Int, String)].collect().sortBy(_._1).toSeq ==
        Seq((2, "y"), (3, "z"), (4, "w")))
    } finally q.stop()
  }

  test("schema evolution mid-history: old files null-fill added columns") {
    val (wh, st) = mkWarehouse()
    st.create("ev", (1 to 1).toDF("id").schema)
    st.append("ev", (1 to 3).toDF("id"), 1000L)
    st.addColumns("ev", StructType(Seq(StructField("tag", StringType))))
    st.append("ev", Seq((4, "x"), (5, "y")).toDF("id", "tag"), 2000L)
    val q = reader(wh, "ev").load().writeStream
      .format("memory").queryName("tss_evolve").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tss_evolve").as[(Int, Option[String])]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq((1, None), (2, None), (3, None),
        (4, Some("x")), (5, Some("y"))))
    } finally q.stop()
  }
}
