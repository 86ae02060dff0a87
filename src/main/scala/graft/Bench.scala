package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line to stdout and writes the
  * same line to `SPARK_GRAFT_BENCH_OUT` (default `bench_out.json` in the
  * working directory) so the driver can parse it even if a build tool
  * decorates stdout. A failed query records `-1` and lands in `"failed"`
  * instead of masquerading as a fast green bar; one warmup query runs
  * first so JIT/codegen warmup isn't billed to whichever query happens to
  * be iterated first.
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: scan-only then join+agg+shuffle, so JIT/codegen/shuffle
    // machinery costs aren't billed to whichever query runs first.
    Seq("q_filter_count", "q_multiway_join").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $w failed: $e") }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s""""$k"""" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
