package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.store.TableStore

/** Streaming CDC through the DSv2 source (`readChangeFeed=true`):
  * micro-batches deliver row-level insert/delete changes — appends from
  * their data files, COW commits from their MATERIALIZED change files —
  * tagged with commit id and timestamp, exactly once across restarts.
  * COW history without stored change files fails the stream loudly
  * (Delta's streaming-CDF contract).
  */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def mkWarehouse(): (String, TableStore) = {
    val wh = Files.createTempDirectory("graft-cdcs").toUri.toString
    (wh, new TableStore(new HPath(new HPath(wh), "default"), spark))
  }

  private def cdcReader(wh: String, table: String) =
    spark.readStream.format("graft-table")
      .option("warehouse", wh).option("table", table)
      .option("readChangeFeed", "true")

  test("micro-batches stream inserts AND deletes with commit tags") {
    val (wh, st) = mkWarehouse()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("id", "v"), 1000L)
    val q = cdcReader(wh, "t").load().writeStream
      .format("memory").queryName("cdc_basic").outputMode("append").start()
    try {
      q.processAllAvailable()
      st.updateWhere("t", Seq("v" -> (col("v") * 10)), Some(col("id") === 2),
        2000L)
      st.deleteWhere("t", col("id") === 3, 3000L)
      st.compact("t") // must pass through silently
      q.processAllAvailable()
      val got = spark.table("cdc_basic")
        .select($"id", $"v", $"_change_type", $"_commit_snapshot_id")
        .as[(Int, Double, String, Long)].collect().toSeq.sorted
      assert(got == Seq(
        (1, 1.0, "insert", 1L), (2, 2.0, "delete", 2L), (2, 2.0, "insert", 1L),
        (2, 20.0, "insert", 2L), (3, 3.0, "delete", 3L), (3, 3.0, "insert", 1L)))
      // commit timestamps ride along (epoch ms preserved through micros)
      val ts = spark.table("cdc_basic")
        .filter($"_commit_snapshot_id" === 2L)
        .select($"_commit_timestamp").distinct()
        .as[java.sql.Timestamp].head()
      assert(ts.getTime == 2000L)
    } finally q.stop()
  }

  test("equality commits with the feed ON stream their stored diff; " +
      "without it the stream fails loudly") {
    val (wh, st) = mkWarehouse()
    st.create("t", Seq((1L, "a")).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 1000L)
    val q = cdcReader(wh, "t").load().writeStream
      .format("memory").queryName("cdc_eq").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the Flink-CDC writer shape mid-stream: replace key 2, insert 3
      st.equalityUpsert("t",
        Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), Seq("id"), 2000L)
      q.processAllAvailable()
      val got = spark.table("cdc_eq")
        .select($"id", $"v", $"_change_type", $"_commit_snapshot_id")
        .as[(Long, String, String, Long)].collect().toSeq.sorted
      assert(got == Seq(
        (1L, "a", "insert", 1L), (2L, "b", "delete", 2L),
        (2L, "b", "insert", 1L), (2L, "b2", "insert", 2L),
        (3L, "c", "insert", 2L)))
    } finally q.stop()
    // feed OFF: an equality commit has no stored diff — loud failure
    val (wh2, st2) = mkWarehouse()
    st2.create("t", Seq((1L, "a")).toDF("id", "v").schema)
    st2.append("t", Seq((1L, "a")).toDF("id", "v"), 1000L)
    val q2 = cdcReader(wh2, "t").load().writeStream
      .format("memory").queryName("cdc_eq_off").outputMode("append").start()
    try {
      q2.processAllAvailable()
      st2.equalityDelete("t", Seq(1L).toDF("id"), 2000L)
      val ex = intercept[StreamingQueryException](q2.processAllAvailable())
      assert(ex.getMessage.contains("change") ||
        Option(ex.getCause).exists(_.getMessage.contains("change")))
    } finally q2.stop()
  }

  test("checkpoint restart resumes without duplicates") {
    import scala.jdk.CollectionConverters._
    val (wh, st) = mkWarehouse()
    val ckpt = Files.createTempDirectory("graft-cdcs-ck").toString
    st.create("t", Seq((1, "a")).toDF("id", "s").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1, "a"), (2, "b")).toDF("id", "s"), 1000L)
    def run(): Seq[(Int, String)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
      val q = cdcReader(wh, "t").load().writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.select(col("id"), col("_change_type")).collect()
            .foreach(r => got.add((r.getInt(0), r.getString(1))))
        }
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable(); got.asScala.toSeq.sorted }
      finally q.stop()
    }
    assert(run() == Seq((1, "insert"), (2, "insert")))
    st.deleteWhere("t", col("id") === 1, 2000L)
    // fresh collector, same checkpoint: only the NEW change arrives
    assert(run() == Seq((1, "delete")))
  }

  test("COW history without stored change files fails the stream loudly") {
    val (wh, st) = mkWarehouse()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.append("t", Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), 1000L)
    st.deleteWhere("t", col("id") === 1, 2000L) // feed never enabled
    val q = cdcReader(wh, "t").load().writeStream
      .format("memory").queryName("cdc_fail").outputMode("append").start()
    try {
      val e = intercept[StreamingQueryException](q.processAllAvailable())
      assert(e.getMessage.contains("ENABLE CHANGE FEED") ||
        Option(e.getCause).exists(_.getMessage.contains("ENABLE CHANGE FEED")))
    } finally q.stop()
  }

  test("where/columns/skipRewrites are rejected in CDC mode") {
    val (wh, st) = mkWarehouse()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", Seq(1).toDF("id"), 1000L)
    val e = intercept[Exception](
      cdcReader(wh, "t").option("where", "id > 0").load())
    assert(e.getMessage.contains("not supported with readChangeFeed"))
  }
}
