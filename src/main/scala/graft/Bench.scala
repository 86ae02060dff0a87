package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`. The FULL per-query payload (both runs plus the
  * min-of-runs map) goes to `SPARK_GRAFT_BENCH_OUT` (default
  * `bench_out.json`); stdout gets only a COMPACT totals-only JSON line as
  * the last line printed — the 61-query two-pass payload outgrew the
  * driver's stdout tail capture, which starts mid-line and parses to
  * null. A failed query records `-1` and lands in `"failed"` instead of
  * masquerading as a fast green bar; one warmup query runs first so
  * JIT/codegen warmup isn't billed to whichever query happens to be
  * iterated first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // int64-micros timestamps (Iceberg's own mandate): INT96 is
      // deprecated and carries no usable footer statistics
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // cost-based optimization: tables carrying COMPUTE STATS plan
      // joins/broadcasts from row counts + NDV, not file size
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: scan-only then join+agg+shuffle, so JIT/codegen/shuffle
    // machinery costs aren't billed to whichever query runs first.
    Seq("q_filter_count", "q_multiway_join").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $w failed: $e") }
    }

    // Streaming warmup (10 rows): micro-batch engine, state-store
    // provider, and the graft-table source — the ~10 s one-time
    // StreamingQuery machinery init used to be billed to whichever
    // streaming entry ran first (q_stream_dedup's first pass read 3.5×
    // its steady state at r14). Batch warmup above can't reach any of
    // this; the measured entries still pay their own per-query work.
    try {
      import org.apache.spark.sql.functions._
      val wh = Files.createTempDirectory("graft-warm")
      val cat = new graft.catalog.GraftCatalog(wh, spark)
      cat.createDatabase("default")
      val base = spark.range(10).selectExpr("cast(id as string) AS okey",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts")
      cat.createTable("warm", base.schema)
      cat.append("warm", base, 1000L)
      def src = spark.readStream.format("graft-table")
        .option("warehouse", wh.toString).option("table", "warm").load()
        .withColumn("ts", col("ts").cast("timestamp"))
      val dq = graft.streaming.EventStreams
        .dedupStream(src, "okey", watermarkDelay = "1 hour")
        .writeStream.format("memory").queryName("bench_warm_dedup")
        .outputMode("append").start()
      try dq.processAllAvailable() finally dq.stop()
      val joined = graft.streaming.EventStreams.joinStreams(
        src.select(col("okey").as("l_k"), col("ts").as("l_ts")),
        src.select(col("okey").as("r_k"), col("ts").as("r_ts")),
        "l_k", "r_k", "l_ts", "r_ts",
        lag = "1 hour", watermarkDelay = "1 hour")
      val jq = joined.writeStream.format("memory").queryName("bench_warm_join")
        .outputMode("append").start()
      try jq.processAllAvailable() finally jq.stop()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming warmup failed: $e")
    }

    // Two full back-to-back passes: single-sample totals have shown ±2×
    // machine-noise swings across rounds on byte-identical code, so one
    // number cannot distinguish a regression from scheduler contention.
    // `value` stays the FIRST pass (comparable with earlier rounds);
    // `value_run2` + `runs` bound the noise.
    def timed(name: String)(body: => Unit): (String, Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { body; true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0, ok)
    }
    // Streaming entries pay the state store per shuffle partition per
    // micro-batch: 32 partitions × a handful of batches is pure
    // bookkeeping at bench scale (r14: q_stream_join spent 7.1 s of
    // 7.3 s in drain; the r22 A/B read q_stream_neardup 6.4 s at 8
    // partitions vs 16.5 s at 32). The count now derives from the
    // session's core count via SparkEntry.streamShufflePartitions
    // (max(4, cpus/4) — 8 at 32 cores, identical to the former pinned
    // value, so round-over-round numbers stay comparable; the same
    // formula applies at every core count the driver runs). Results are
    // partition-count-invariant (the oracle gate runs these same
    // queries at the default).
    val streamingEntries =
      Set("q_stream_dedup", "q_stream_join", "q_stream_table", "q_stream_cdc",
        "q_stream_upsert", "q_stream_neardup")
    val streamParts = SparkEntry.streamShufflePartitions(cpus.toInt).toString
    def withStreamConf[T](name: String)(body: => T): T =
      if (!streamingEntries(name)) body
      else {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", streamParts)
        try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    def runAll(): Seq[(String, Double, Boolean)] = {
      val main = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val res = SparkEntry.benchSplits.get(name) match {
          // write-dominated entries: one execution, reported as the
          // historical headline name PLUS _fixture/_query sub-metrics,
          // so the read-path cost stays visible under the write noise
          case Some(split) =>
            try {
              val (fixSec, qSec) = withStreamConf(name)(split.run(spark, sfDir))
              Seq((name, fixSec + qSec, true),
                (s"${name}_fixture", fixSec, true),
                (s"${name}_query", qSec, true))
            } catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              Seq((name, -1.0, false))
            }
          case None =>
            Seq(timed(name)(withStreamConf(name)(fn(spark, sfDir).count())))
        }
        // reclaim the entry's scratch warehouses OUTSIDE the timed body:
        // ~300 accumulated fixture warehouses of dirty page cache and
        // writeback otherwise tax every later entry's I/O (r14 measured
        // a uniform ~1.2-1.4× inflation across the tail of the run).
        // Also drop cached/persisted frames: operators that persist
        // model aggregates (the LM tier) would otherwise serve later
        // entries — and the second pass — from cache, so per-entry
        // times would attribute one entry's model fit to another and
        // the min-of-runs basis would flatter cached entries.
        SparkEntry.cleanScratchDirs()
        spark.catalog.clearCache()
        res
      }
      // q_embed_ivf bills k-means + index write to a query named like a
      // lookup; these sub-metrics keep probe-side regressions visible.
      val idx = Files.createTempDirectory("graft-ivf-bench").toString
      val build = timed("q_embed_ivf_build")(SparkEntry.ivfBuild(spark, sfDir, idx))
      val probe = timed("q_embed_ivf_probe")(
        SparkEntry.ivfProbeQuery(spark, sfDir, idx).count())
      // q_stream_table's headline is mostly StreamingQuery lifecycle
      // fixture; these sub-metrics keep the engine-work (drain) cost
      // comparable round-over-round without the fixture noise.
      val (fixSec, drainSec) =
        try withStreamConf("q_stream_table")(SparkEntry.streamTableSplit(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] q_stream_table split FAILED: ${e.getMessage}")
          (-1.0, -1.0)
        }
      val (sdFixSec, sdDrainSec) =
        try withStreamConf("q_stream_dedup")(SparkEntry.streamDedupSplit(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] q_stream_dedup split FAILED: ${e.getMessage}")
          (-1.0, -1.0)
        }
      val (sjFixSec, sjDrainSec) =
        try withStreamConf("q_stream_join")(SparkEntry.streamJoinSplit(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] q_stream_join split FAILED: ${e.getMessage}")
          (-1.0, -1.0)
        }
      main :+ build :+ probe :+
        ("q_stream_table_fixture", fixSec, fixSec >= 0) :+
        ("q_stream_table_drain", drainSec, drainSec >= 0) :+
        ("q_stream_dedup_fixture", sdFixSec, sdFixSec >= 0) :+
        ("q_stream_dedup_drain", sdDrainSec, sdDrainSec >= 0) :+
        ("q_stream_join_fixture", sjFixSec, sjFixSec >= 0) :+
        ("q_stream_join_drain", sjDrainSec, sjDrainSec >= 0)
    }
    // SPARK_GRAFT_BENCH_PASSES=1 → one-shot (the sf1 full-suite run,
    // where a second pass doubles an already-long wall-clock); default
    // stays two passes for the noise-bounding min-of-runs.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val results = runAll()
    val results2 = if (passes > 1) runAll() else results
    def jmap(rs: Seq[(String, Double, Boolean)]): String =
      rs.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    // Min-of-two-runs per query: the round-over-round comparison basis —
    // single samples have shown ±2× scheduler-contention swings on
    // byte-identical code, and min-of-N discards exactly that noise.
    val minByName = results.map(r => r._1 -> r).toMap
    val resultsMin = results2.map { case (k, v2, ok2) =>
      val (_, v1, ok1) = minByName(k)
      if (ok1 && ok2) (k, math.min(v1, v2), true)
      else if (ok1) (k, v1, true) else (k, v2, ok2)
    }
    val failed = (results ++ results2).collect { case (k, _, false) => s""""$k"""" }
      .distinct.mkString("[", ",", "]")
    // Sub-metrics (_build/_probe/_fixture/_drain/_query) re-slice time
    // already billed to their parent entry — the headline total counts
    // TOP-LEVEL queries only, or splitting a query would change the
    // total on byte-identical engine code.
    def isSub(name: String): Boolean =
      name.endsWith("_build") || name.endsWith("_probe") ||
        name.endsWith("_fixture") || name.endsWith("_drain") ||
        name.endsWith("_query")
    def total(rs: Seq[(String, Double, Boolean)]): Double =
      rs.collect { case (k, v, true) if !isSub(k) => v }.sum
    val (t1, t2, tMin) = (total(results), total(results2), total(resultsMin))
    val nTop = results.count(r => !isSub(r._1))
    val full =
      s"""{"metric":"total","value":$t1,"unit":"sec","value_run2":$t2,""" +
        s""""value_min":$tMin,"runs":[$t1,$t2],"queries":${jmap(results)},""" +
        s""""queries_run2":${jmap(results2)},"queries_min":${jmap(resultsMin)},""" +
        s""""failed":$failed,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), full + "\n")
    // Compact line LAST on stdout, short enough that the driver's tail
    // capture always contains its start. It embeds the per-query
    // min-of-runs map (ms precision) — the round-over-round comparison
    // basis must live in BENCH_rXX.json itself, not depend on
    // bench_out.json surviving the round.
    val minCompact = resultsMin
      .map { case (k, v, _) => s""""$k":${math.rint(v * 1000) / 1000}""" }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":$t1,"unit":"sec","value_run2":$t2,""" +
        s""""value_min":$tMin,"n_queries":$nTop,"n_entries":${results.size},""" +
        s""""failed":$failed,"queries_min":$minCompact,""" +
        s""""detail":"$outPath","sf":"$sfDir"}"""
    spark.stop()
    println(compact)
    if ((results ++ results2).exists(!_._3)) sys.exit(1)
  }
}
