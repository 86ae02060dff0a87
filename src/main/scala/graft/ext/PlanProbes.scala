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
    if (suffix == "after") {
      // the REAL q_apply_changes feed shape: an initial load plus two
      // COW commits, read back through the change-feed scan — synthetic
      // frames mislead here (a unique-key Range lets the optimizer drop
      // the netting exchange entirely)
      val cat = new graft.catalog.GraftCatalog(
        java.nio.file.Files.createTempDirectory("graft-planprobe"), spark)
      cat.createDatabase("default")
      val eng = new graft.sql.Engine(cat)
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      cat.createTable("pp_src", orders.schema)
      cat.append("pp_src", orders, 1000L)
      eng.sql("UPDATE pp_src SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderkey % 5 = 0")
      eng.sql("DELETE FROM pp_src WHERE o_orderkey % 7 = 0")
      val st = cat.store()
      val feed = st.readChanges("pp_src", 0L,
        st.currentSnapshotId("pp_src"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("_commit_snapshot_id").desc, col("_change_type").desc)
      Files.writeString(Paths.get(outDir, "q_apply_changes_netting_before.txt"),
        feed.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
          .queryExecution.explainString(ExplainMode.fromString("formatted")))
      Files.writeString(Paths.get(outDir, "q_apply_changes_netting_after.txt"),
        graft.streaming.EventStreams.netLatestByKey(feed, Seq("o_orderkey"),
            "_commit_snapshot_id")
          .queryExecution.explainString(ExplainMode.fromString("formatted")))
      println("[planprobe] wrote q_apply_changes_netting_{before,after}.txt")
    }

    // 2b. Pipeline stage counts: the r22 observed-metrics form — ONE
    // materializing pass whose plan carries the per-stage counts as
    // CollectMetrics nodes — vs the former chain, where each stage
    // count was its own action re-executing the scan + gates (the
    // "before" dump shows one representative standalone count plan;
    // the entry ran four of them before the dedup materialization).
    {
      val (dupLine, _) = TextAnalysis.repetitionStats(col("text"))
      val alpha = length(regexp_replace(col("text"), "[^a-z]", ""))
        .cast("double") / length(col("text"))
      def gates(d: DataFrame): DataFrame = d
        .filter(col("lang") === "en")
        .filter(TextAnalysis.tokenCount(col("text")).between(20, 100000))
        .filter(alpha >= 0.82)
        .filter(dupLine <= 0.3)
      dump("pipeline_counts_before", gates(docs)
        .groupBy().count())
      val obsT = org.apache.spark.sql.Observation()
      val obsQ = org.apache.spark.sql.Observation()
      dump("pipeline_counts_after",
        Dedup.exactByContent(
          gates(docs.observe(obsT, count(lit(1)).as("n")))
            .observe(obsQ, count(lit(1)).as("n")),
          "text", "doc_id"))
    }

    // 2c. CDC diff (TableStore.changeDiff, consumed by readChanges /
    // writeChangeFiles on every CDC/MOR/mv-retract feed path): ONE
    // count-and-replicate aggregation with a per-direction counter vs
    // the former two independent exceptAll aggregations, each scanning
    // both sides. Dumped over identical stand-in frames so the operator
    // shapes are directly comparable.
    {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      val removed = orders.filter(col("o_orderkey") % 5 === 0)
      val added = removed.withColumn("o_totalprice", col("o_totalprice") * 2)
      // dump the EXECUTED adaptive plans: the fused form's win — the
      // two directions' final aggregates sharing ONE exchange — is an
      // AQE-runtime exchange reuse, invisible in the initial plan
      def dumpExecuted(name: String, df: DataFrame): Unit = {
        // execute THIS QueryExecution (toRdd, no column pruning) so the
        // AdaptiveSparkPlan is finalized with its runtime reuse nodes
        df.queryExecution.toRdd.count()
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
          df.queryExecution.explainString(
            ExplainMode.fromString("formatted")))
        println(s"[planprobe] wrote ${name}_$suffix.txt (executed)")
      }
      dumpExecuted("cdc_diff_exceptall_before",
        removed.exceptAll(added)
          .withColumn("_change_type", lit("delete"))
          .unionByName(added.exceptAll(removed)
            .withColumn("_change_type", lit("insert"))))
      val st = new graft.store.TableStore(
        new org.apache.hadoop.fs.Path(
          Files.createTempDirectory("graft-probe-diff").toString), spark)
      dumpExecuted("cdc_diff_fused_after", st.changeDiffFrame(removed, added))
    }

    // 3. PQ/IVF seed pools: the r22 one-pass bounded-pool aggregation
    // (all m+1 pools in one scan) vs the former spelling — m+1
    // independent TakeOrdered corpus scans (one representative dumped;
    // the others differ only in the hash seed literal).
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    dump("seed_pools_takeordered_per_seed",
      emb.select(col("vec_id").cast("long").as("_cid"),
          col("embedding").as("_cv"))
        .orderBy(xxhash64(col("_cid"), lit(42L)))
        .limit(128))
    dump("seed_pools_one_pass",
      Similarity.seedPoolPartials(emb, "vec_id", "embedding",
        42L +: (0 until 4).map(42L + _), 128).toDF())

    spark.stop()
  }
}
