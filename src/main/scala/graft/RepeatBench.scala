package graft

import org.apache.spark.sql.SparkSession

/** Measurement tool (optimization rounds): run the NAMED bench entries
  * K times each in one session and report per-entry min/median — the
  * ambient noise on this box swamps single-sample A/B comparisons
  * (same-tree totals have read 25% apart an hour apart), and min-of-K
  * inside one session discards scheduler contention the way the main
  * bench's min-of-two cannot.
  *
  * Usage: runMain graft.RepeatBench <k> <name> [name...]
  * Timing methodology matches Bench exactly (count() action, split
  * entries run fixture+query, scratch cleaned between runs).
  */
object RepeatBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = args.head.toInt
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmups as Bench
    Seq("q_filter_count", "q_multiway_join").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[repeat] warmup: $e") }
    }
    val streamingEntries =
      Set("q_stream_dedup", "q_stream_join", "q_stream_table", "q_stream_cdc",
        "q_stream_upsert", "q_stream_neardup")
    // A/B knobs (measurement only): SPARK_GRAFT_STREAM_PARTS overrides
    // the stateful shuffle-partition count, SPARK_GRAFT_STATESTORE
    // ("rocksdb" or a provider class) the state-store provider — so the
    // streaming floor can be attributed without editing Bench itself.
    val streamParts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS",
      SparkEntry.streamShufflePartitions(cpus.toInt).toString)
    val stateStore = sys.env.get("SPARK_GRAFT_STATESTORE").map {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case other => other
    }
    def withStreamConf[T](name: String)(body: => T): T =
      if (!streamingEntries(name)) body
      else {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        val prevProv =
          spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        spark.conf.set("spark.sql.shuffle.partitions", streamParts)
        stateStore.foreach(
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
        try body finally {
          spark.conf.set("spark.sql.shuffle.partitions", prev)
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProv)
        }
      }
    names.foreach { name =>
      // a run that throws is excluded from the stats — its (often
      // near-zero) elapsed time would otherwise win min-of-K and report
      // a fast failure as the A/B result
      val all = (1 to k).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try {
            SparkEntry.benchSplits.get(name) match {
              case Some(split) => withStreamConf(name)(split.run(spark, sfDir))
              case None =>
                withStreamConf(name)(SparkEntry.queries(name)(spark, sfDir).count())
            }
            true
          } catch { case e: Throwable =>
            System.err.println(s"[repeat] $name FAILED: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        SparkEntry.cleanScratchDirs()
        spark.catalog.clearCache()
        (sec, ok)
      }
      val samples = all.collect { case (sec, true) => sec }.sorted
      if (samples.isEmpty)
        println(f"[repeat] $name%-28s ALL $k runs FAILED")
      else {
        val med = samples(samples.size / 2)
        println(f"[repeat] $name%-28s min=${samples.head}%7.3f med=$med%7.3f " +
          f"max=${samples.last}%7.3f n_ok=${samples.size}/$k")
      }
    }
    spark.stop()
  }
}
