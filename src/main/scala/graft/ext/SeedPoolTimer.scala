package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement scratch (optimization rounds): times the one-pass
  * seed-pool aggregation against the former per-seed TakeOrdered scans
  * in one session, K alternating repetitions — isolates the fixed-cost
  * question from the full q_embed_pq fixture.
  */
object SeedPoolTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[seedpooltimer] rows=${emb.count()}")
    def takeOrdered(): Unit = {
      val pools = graft.store.TableStore.inParallel((0 until 4).toVector)(j =>
        emb.select(col("vec_id").cast("long").as("_cid"),
            col("embedding").as("_cv"))
          .orderBy(xxhash64(col("_cid"), lit(42L + j)))
          .limit(128).collect())
      require(pools.forall(_.length == 128))
    }
    def onePass(): Unit = {
      val pools = Similarity.seedPools(emb, "vec_id", "embedding",
        (0 until 4).map(42L + _), 128)
      require(pools.forall(_.size == 128))
    }
    def time(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val to = Seq.newBuilder[Double]
    val op = Seq.newBuilder[Double]
    (1 to k).foreach { _ =>
      to += time("takeOrdered")(takeOrdered())
      op += time("onePass")(onePass())
    }
    def stats(xs: Seq[Double]) =
      f"min=${xs.min}%6.3f med=${xs.sorted.apply(xs.size / 2)}%6.3f"
    println(s"[seedpooltimer] takeOrdered x4: ${stats(to.result())}")
    println(s"[seedpooltimer] onePass      : ${stats(op.result())}")
    spark.stop()
  }
}
