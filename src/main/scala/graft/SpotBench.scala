package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** One-shot scaling probe: run a named subset of the bench queries ONCE
  * against an arbitrary sf directory and print per-query seconds as one
  * JSON line. Exists to answer the question the per-round sf0.1 bench
  * cannot: do the heavy operators scale LINEARLY in rows, or is there a
  * superlinear cliff (band skew, iteration growth, driver state) hiding
  * below the largest shipped scale factor? Run it on GenData output at
  * sf1 and compare per-query against bench_out.json's sf0.1 numbers.
  *
  * Usage: `runMain graft.SpotBench <sfDir> [query ...]`
  * (default = the round-12 verdict's top-5 heavy set + the ivf/stream
  * sub-metrics, plus two scan/agg/join-bound controls).
  */
object SpotBench {
  val DefaultSet: Seq[String] = Seq(
    "q_dedup_clusters", "q_minhash_pairs", "q_embed_ivf", "q_sql_merge",
    "q_stream_table", "q_pricing_summary", "q_multiway_join")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SpotBench <sfDir> [query ...]")
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // cost-based optimization: tables carrying COMPUTE STATS plan
      // joins/broadcasts from row counts + NDV, not file size
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warmup as Bench: JIT/codegen/shuffle startup isn't billed to
    // the first measured query
    Seq("q_filter_count", "q_multiway_join").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[spot] warmup $w failed: $e") }
    }

    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try { body; (name, (System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[spot] $name FAILED: ${e.getMessage}")
        (name, -1.0)
      }
    }

    val results = names.flatMap {
      case "q_embed_ivf" =>
        val idx = Files.createTempDirectory("graft-ivf-spot").toString
        Seq(timed("q_embed_ivf_build")(SparkEntry.ivfBuild(spark, sfDir, idx)),
          timed("q_embed_ivf_probe")(
            SparkEntry.ivfProbeQuery(spark, sfDir, idx).count()))
      case "q_stream_table" =>
        try {
          val (fix, drain) = SparkEntry.streamTableSplit(spark, sfDir)
          Seq(("q_stream_table_fixture", fix), ("q_stream_table_drain", drain))
        } catch { case e: Throwable =>
          System.err.println(s"[spot] q_stream_table FAILED: ${e.getMessage}")
          Seq(("q_stream_table", -1.0))
        }
      case "q_stream_join" =>
        try {
          val (fix, drain) = SparkEntry.streamJoinSplit(spark, sfDir)
          Seq(("q_stream_join_fixture", fix), ("q_stream_join_drain", drain))
        } catch { case e: Throwable =>
          System.err.println(s"[spot] q_stream_join FAILED: ${e.getMessage}")
          Seq(("q_stream_join", -1.0))
        }
      case name if SparkEntry.benchSplits.contains(name) =>
        try {
          val (fix, q) = SparkEntry.benchSplits(name).run(spark, sfDir)
          Seq((s"${name}_fixture", fix), (s"${name}_query", q))
        } catch { case e: Throwable =>
          System.err.println(s"[spot] $name FAILED: ${e.getMessage}")
          Seq((name, -1.0))
        }
      case name =>
        Seq(timed(name)(SparkEntry.queries(name)(spark, sfDir).count()))
    }
    val js = results
      .map { case (k, v) => s""""$k":${math.rint(v * 1000) / 1000}""" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"spot","unit":"sec","queries":$js,"sf":"$sfDir"}""")
  }
}
