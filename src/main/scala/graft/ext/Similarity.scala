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

  /** IVF-flat index: assign every vector to its nearest of `nlist`
    * centroids (deterministic sample of the data itself, the FAISS-style
    * IVF training shortcut). The returned frame adds an `_ivf_list`
    * column; at cluster scale you persist it partitioned/bucketed by
    * `_ivf_list`, so a probe reads only nprobe/nlist of the data —
    * the partition-pruning analogue for vector search, where LSH prunes
    * per-row and IVF prunes per-file.
    */
  def ivfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, seed: Long = 42L): (DataFrame, Seq[Array[Float]]) = {
    val centroids = embeddings
      .select(col(idCol).cast("long").as("_cid"), col(vecCol).as("_cv"))
      .orderBy(xxhash64(col("_cid"), lit(seed)))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).toArray)
      .toSeq
    (embeddings.withColumn("_ivf_list", nearestCentroid(col(vecCol), centroids)),
      centroids)
  }

  /** Nearest-centroid id as a codegen-friendly expression: one cosine
    * per centroid, argmax via `greatest` over (score, id) structs. */
  private def nearestCentroid(vec: Column, centroids: Seq[Array[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(GraftFunctions.cosineSim(vec, lit(c)).as("s"), lit(i).as("c"))
    }
    greatest(scored: _*).getField("c")
  }

  /** IVF-pruned top-k: score only the `nprobe` lists nearest to the
    * query. Exact ranking within the probed lists (IVF-flat). */
  def ivfTopK(indexed: DataFrame, centroids: Seq[Array[Float]],
      idCol: String, vecCol: String, query: Array[Float], k: Int,
      nprobe: Int = 4): DataFrame = {
    val probeLists = centroids.zipWithIndex
      .map { case (c, i) => (cosine(query, c), i) }
      .sortBy(-_._1).take(nprobe).map(_._2)
    cosineTopK(indexed.filter(col("_ivf_list").isin(probeLists: _*)),
      idCol, vecCol, query, k)
  }

  /** Driver-side cosine (query vs centroid — tiny). */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
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
