package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — north-star extension (SURVEY.md §2.11).
  *
  * Plans by scale:
  * - one query vector → brute-force scan + `TakeOrderedAndProject`
  *   (scan-local top-k per partition; only k rows reach the driver);
  * - a query *table* → broadcast the queries, score per (row, query),
  *   reduce with a bounded-heap Aggregator so each partition ships at
  *   most k candidates per query into the shuffle (map-side combine);
  * - LSH path → hyperplane bucket equality prunes the scan before any
  *   scoring (the IVF analogue: buckets = fixed random centroids' signs).
  */
object Similarity {

  /** Brute-force cosine top-k for one query vector. The filter+project
    * run inside whole-stage codegen; ordering is TakeOrderedAndProject
    * (no global sort). */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = lit(query)
    embeddings
      .select(col(idCol), GraftFunctions.cosineSim(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Top-k for every row of a (small) query table. Queries are broadcast;
    * the per-partition heap bounds shuffle volume at k·partitions·queries
    * rows instead of rows·queries. */
  def cosineTopKForQueries(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val scored = embeddings.crossJoin(
        broadcast(queries.select(col(qidCol).as("_qid"), col(qvecCol).as("_qvec"))))
      .select(col("_qid"),
        GraftFunctions.cosineSim(col(vecCol), col("_qvec")).as("score"),
        col(idCol).cast("long").as("id"))
    val topk = new TopKAggregator(k)
    // udaf with a product input encoder flattens the case-class fields
    // into one argument per field
    scored.groupBy(col("_qid"))
      .agg(udaf(topk, Encoders.product[Candidate])
        .apply(col("score"), col("id")).as("neighbors"))
      .select(col("_qid").as("query_id"),
        posexplode(col("neighbors")).as(Seq("rank", "n")))
      .select(col("query_id"), (col("rank") + 1).as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("score"))
  }

  /** LSH-pruned ANN: score only rows whose hyperplane sketch is within
    * `maxHammingProbe` bits of the query's sketch (multi-probe); falls
    * back to exact ranking within the pruned set. At cluster scale the
    * sketch comparison is a scan-local integer op — the scan prunes
    * before any vector math. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, numPlanes: Int = 16,
      maxHammingProbe: Int = 2, seed: Long = 42L): DataFrame = {
    val qBits = sketchOf(query, numPlanes, seed)
    val pruned = embeddings
      .withColumn("_bucket", GraftFunctions.hyperplaneLsh(col(vecCol), numPlanes, seed))
      .filter(bit_count(col("_bucket").bitwiseXOR(lit(qBits))) <= maxHammingProbe)
    cosineTopK(pruned, idCol, vecCol, query, k)
  }

  /** Driver-side sketch of one query vector (same bit function the
    * executors apply via [[graft.functions.HyperplaneLsh]]). */
  def sketchOf(vec: Array[Float], numPlanes: Int, seed: Long): Long = {
    var bits = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0; var i = 0
      while (i < vec.length) {
        dot += vec(i) * graft.functions.HyperplaneLsh.component(seed, p, i); i += 1
      }
      if (dot >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}

final case class Candidate(score: Double, id: Long)

/** Bounded min-heap top-k aggregator: partial aggregation keeps at most k
  * candidates per partition (map-side combine), so the shuffle carries
  * O(k · partitions) rows per group — the piece that makes broadcast-join
  * ANN viable at 100 TB. */
final class TopKAggregator(k: Int)
    extends Aggregator[Candidate, Seq[Candidate], Seq[Candidate]] {

  override def zero: Seq[Candidate] = Vector.empty

  private def push(buf: Seq[Candidate], c: Candidate): Seq[Candidate] =
    if (buf.size < k) (buf :+ c).sortBy(x => (-x.score, x.id))
    else if (c.score > buf.last.score ||
             (c.score == buf.last.score && c.id < buf.last.id))
      (buf.dropRight(1) :+ c).sortBy(x => (-x.score, x.id))
    else buf

  override def reduce(buf: Seq[Candidate], c: Candidate): Seq[Candidate] = push(buf, c)

  override def merge(a: Seq[Candidate], b: Seq[Candidate]): Seq[Candidate] =
    (a ++ b).sortBy(x => (-x.score, x.id)).take(k)

  override def finish(r: Seq[Candidate]): Seq[Candidate] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Candidate]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Candidate]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Candidate]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Candidate]]()
}
