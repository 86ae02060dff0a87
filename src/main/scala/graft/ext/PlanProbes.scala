package graft.ext

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Measurement tool (optimization rounds): dumps the FORMATTED plans of
  * operator-INTERNAL frames that never appear in a query's final plan
  * (the netting aggregate inside the CDC apply, the LM gram-count
  * aggregation, the PQ training aggregation) so before/after plan-shape
  * claims are checkable. Run from both the optimized tree and a
  * baseline worktree with the same output dir to produce the pair.
  *
  * Usage: runMain graft.ext.PlanProbes <outDir> <suffix>
  */
object PlanProbes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("plans/r21")
    val suffix = args.drop(1).headOption.getOrElse("after")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
        df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"[planprobe] wrote ${name}_$suffix.txt")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // 1. LM fit: the gram-count aggregation + scoring plan (lmScoresRaw
    // is the un-materialized seam the plan-shape spec uses too).
    val (scores, scratch) = Search.lmScoresRaw(docs, "doc_id", "text", 1000)
    dump("lm_scores", scores)
    scratch.foreach(_.unpersist())

    // 2. CDC apply netting: the per-key last-writer frame the apply
    // commits from. Both spellings are dumped from one tree (the window
    // form below is the verbatim pre-round spelling of
    // ChangeFeedFollower.applyChanges; the max_by form is what the
    // shipped code calls now — see EventStreams.netLatestByKey).
    val feed = docs.limit(1000).select(
      col("doc_id").as("k"), col("text"),
      lit("insert").as("_change_type"),
      lit(1L).as("_commit_snapshot_id"),
      current_timestamp().as("_commit_timestamp"))
    if (suffix == "after") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k"))
        .orderBy(col("_commit_snapshot_id").desc, col("_change_type").desc)
      dump("cdc_netting_window_form",
        feed.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1))
      dump("cdc_netting_maxby_form",
        graft.streaming.EventStreams.netLatestByKey(feed, Seq("k"),
          "_commit_snapshot_id"))
    }

    spark.stop()
  }
}
