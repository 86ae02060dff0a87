package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** ANN operators: brute-force ground truth vs the LSH- and IVF-pruned
  * paths, and the bounded-heap multi-query aggregator.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 40 deterministic unit-ish vectors in 8 dims, plus a near-copy of v0
  private val vecs = {
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    base :+ (99L, base.head._2.map(x => x * 0.99f + 0.001f)) // near-dup of v0
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")
  private val query = vecs.head._2

  test("brute-force cosine top-k ranks the near-duplicate right after the query itself") {
    val top = Similarity.cosineTopK(df, "vec_id", "embedding", query, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(top.take(2).toSet == Set(0L, 99L))
  }

  test("IVF search finds the brute-force top-1 and prunes the scan") {
    val (indexed, centroids) = Similarity.ivfIndex(df, "vec_id", "embedding",
      nlist = 8)
    assert(centroids.size == 8)
    // every row gets a list id within [0, nlist)
    val lists = indexed.select("_ivf_list").distinct().as[Int].collect()
    assert(lists.forall(l => l >= 0 && l < 8))
    val top = Similarity.ivfTopK(indexed, centroids, "vec_id", "embedding",
      query, k = 3, nprobe = 4)
      .select("vec_id").as[Long].collect().toSeq
    // the query vector and its near-copy land in the same probed list
    assert(top.contains(0L) && top.contains(99L))
    // pruning is real: fewer rows scanned than the full table
    val probed = Similarity.ivfTopK(indexed, centroids, "vec_id", "embedding",
      query, k = 100, nprobe = 2).count()
    assert(probed < vecs.size)
  }

  // 8 well-separated clusters of 40 vectors each: k-means must recover
  // the cluster structure, and a probe of a few lists must carry ~all of
  // the true neighbors of a query near one cluster's center.
  private lazy val clustered = {
    val rnd = new scala.util.Random(11)
    val centers = (0 until 8).map(_ => Array.fill(16)(rnd.nextFloat() * 2 - 1))
    (0 until 8).flatMap { c =>
      (0 until 40).map { j =>
        val v = centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
        ((c * 40 + j).toLong, v)
      }
    }
  }
  private lazy val clusteredDf = clustered.toDF("vec_id", "embedding")

  test("k-means centroids separate planted clusters") {
    val cents = Similarity.kmeansCentroids(clusteredDf, "vec_id", "embedding",
      nlist = 8, iters = 5)
    assert(cents.size == 8)
    // every planted cluster maps (almost) wholly to one learned list
    val (indexed, _) = Similarity.ivfIndex(clusteredDf, "vec_id", "embedding",
      nlist = 8, iters = 5)
    val purity = indexed
      .groupBy(($"vec_id" / 40).cast("int").as("truth"), $"_ivf_list")
      .count()
      .groupBy($"truth")
      .agg(org.apache.spark.sql.functions.max($"count").as("m"),
        org.apache.spark.sql.functions.sum($"count").as("n"))
      .select(($"m" / $"n").as("p")).as[Double].collect()
    assert(purity.forall(_ >= 0.9), s"cluster purity too low: ${purity.toSeq}")
  }

  test("persisted IVF probe: recall@10 >= 0.9 vs brute force, fewer files read") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    Similarity.ivfWriteIndex(clusteredDf, "vec_id", "embedding", idx,
      nlist = 8, iters = 5)
    val queries = Seq(clustered(5)._2, clustered(45)._2, clustered(205)._2)
    val recalls = queries.map { q =>
      val truth = Similarity.cosineTopK(clusteredDf, "vec_id", "embedding", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val got = Similarity.ivfProbe(spark, idx, "vec_id", "embedding", q,
        k = 10, nprobe = 2)
        .select("vec_id").as[Long].collect().toSet
      truth.intersect(got).size / 10.0
    }
    assert(recalls.forall(_ >= 0.9), s"recall@10 too low: $recalls")
    // the probe reads strictly fewer FILES than the whole index — I/O
    // pruning, not row filtering (the index is a store table now; its
    // data files live under <warehouse>/ivf/data)
    val allFiles = spark.read.parquet(s"$idx/ivf/data").inputFiles.length
    val probeFiles = Similarity.ivfProbe(spark, idx, "vec_id", "embedding",
      queries.head, k = 10, nprobe = 2).inputFiles.length
    assert(probeFiles > 0 && probeFiles < allFiles,
      s"probe read $probeFiles of $allFiles files")
    // centroids round-trip through the index directory
    assert(Similarity.readCentroids(spark, idx).size == 8)
  }

  test("ivfAppend: vectors added post-index are recalled by the probe") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    Similarity.ivfWriteIndex(clusteredDf, "vec_id", "embedding", idx,
      nlist = 8, iters = 5)
    // plant 5 near-duplicates of a query AFTER the index was built —
    // an index that ignores appends would miss all of them
    val q = clustered(45)._2
    // tiny shifts: the planted five must sit closer to q than its own
    // cluster's ±0.05-noise neighbors, or top-6 legitimately prefers those
    val planted = (0 until 5).map(i =>
      (900000L + i, q.map(x => x + 0.002f * (i + 1))))
    Similarity.ivfAppend(planted.toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx)
    val got = Similarity.ivfProbe(spark, idx, "vec_id", "embedding", q,
      k = 6, nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(planted.map(_._1).toSet.subsetOf(got),
      s"appended vectors missed by probe: got $got")
    // the append reused the stored centroids — not a retrain
    assert(Similarity.readCentroids(spark, idx).size == 8)
    // appending to a non-index fails loudly, no silent empty index
    intercept[Exception](Similarity.ivfAppend(
      planted.toDF("vec_id", "embedding"), "vec_id", "embedding",
      java.nio.file.Files.createTempDirectory("graft-noidx").toString))
  }

  test("IVF index is transactional: aborted appends invisible, rebuilds keep history") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-txn").toString
    Similarity.ivfWriteIndex(clusteredDf, "vec_id", "embedding", idx,
      nlist = 8, iters = 2)
    val q = clustered(45)._2
    def probe(): Seq[Long] = Similarity.ivfProbe(spark, idx,
      "vec_id", "embedding", q, k = 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    val before = probe()
    // a crashed append: data files land under data/ but the commit never
    // happens — visibility comes from the snapshot log, so the probe
    // result must be byte-identical (the raw-parquet design this
    // replaced made such files visible per-task-rename)
    (0 until 3).map(i => (800000L + i, q.map(x => x + 0.001f * (i + 1))))
      .toDF("vec_id", "embedding")
      .withColumn("_ivf_list", org.apache.spark.sql.functions.lit(7))
      .write.mode("append").parquet(s"$idx/ivf/data")
    assert(probe() == before, "probe observed files from an uncommitted append")
    // a committed append IS visible — same planted vectors, via the log
    val st0 = new graft.store.TableStore(
      new org.apache.hadoop.fs.Path(idx), spark)
    val preAppendId = st0.currentSnapshotId("ivf").get
    Similarity.ivfAppend(
      (0 until 3).map(i => (800000L + i, q.map(x => x + 0.001f * (i + 1))))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", idx)
    assert(probe().toSet.intersect((800000L until 800003L).toSet).nonEmpty)
    // as-of probe pins the pre-append snapshot: the planted vectors
    // vanish and the original answer comes back — index time travel
    val pinned = Similarity.ivfProbe(spark, idx, "vec_id", "embedding", q,
      k = 5, nprobe = 2, asOfSnapshotId = Some(preAppendId))
      .select("vec_id").as[Long].collect().toSeq
    assert(pinned == before, s"as-of probe leaked post-snapshot vectors: $pinned")
    // rebuild is a `replace` commit on the same table: history keeps
    // every version (vacuum/time-travel now work on the index for free)
    Similarity.ivfWriteIndex(clusteredDf, "vec_id", "embedding", idx,
      nlist = 8, iters = 2)
    val st = new graft.store.TableStore(
      new org.apache.hadoop.fs.Path(idx), spark)
    assert(st.history("ivf").count() >= 3)
    assert(probe() == before, "rebuild from the same corpus must restore the original result")
  }

  test("multi-query bounded-heap top-k matches brute force per query") {
    val queries = df.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Similarity.cosineTopKForQueries(df, "vec_id", "embedding",
      queries, "qid", "qvec", k = 3)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    val expected = (0L to 1L).flatMap { qid =>
      val qv = vecs.find(_._1 == qid).get._2
      Similarity.cosineTopK(df, "vec_id", "embedding", qv, 3)
        .select("vec_id").as[Long].collect().map(qid -> _)
    }
    assert(got == expected)
  }

  test("quantized IVF (SQ8): float-index recall, codes-only storage, quantized appends") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-q8").toString
    Similarity.ivfWriteIndexQuantized(clusteredDf, "vec_id", "embedding", idx,
      nlist = 8, iters = 5)
    val q = clustered(45)._2
    val truth = Similarity.cosineTopK(clusteredDf, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val got = Similarity.ivfProbe(spark, idx, "vec_id", "embedding", q,
      k = 10, nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(truth.intersect(got).size >= 9,
      s"quantization cost recall: ${truth.intersect(got).size}/10")
    // the stored rows are int8 codes + scale, never raw floats — the
    // 4x-probe-I/O claim rests on this schema
    val st = new graft.store.TableStore(
      new org.apache.hadoop.fs.Path(idx), spark)
    val cols = st.read("ivf").columns.toSeq
    assert(cols.contains("_q8") && !cols.contains("embedding"), cols.toString)
    // appends pass through the same quantized layout transparently
    val planted = (0 until 3).map(i =>
      (700000L + i, q.map(x => x + 0.001f * (i + 1))))
    Similarity.ivfAppend(planted.toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx)
    val got2 = Similarity.ivfProbe(spark, idx, "vec_id", "embedding", q,
      k = 4, nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(planted.map(_._1).toSet.subsetOf(got2), s"missed appends: $got2")
  }

  test("knnJoin exact mode (nprobe = nlist) equals per-query brute force") {
    val left = clusteredDf.filter($"vec_id" < 3)
    val got = Similarity.knnJoin(left, "vec_id", "embedding",
        clusteredDf, "vec_id", "embedding", k = 4, nlist = 4, nprobe = 4,
        iters = 2)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    val expected = (0L until 3L).flatMap { qid =>
      val qv = clustered.find(_._1 == qid).get._2
      Similarity.cosineTopK(clusteredDf, "vec_id", "embedding", qv, 4)
        .select("vec_id").as[Long].collect().map(qid -> _)
    }
    assert(got == expected)
  }

  test("knnJoin ANN mode (nprobe < nlist) holds recall on clustered data") {
    val left = clusteredDf.filter($"vec_id".isin(5L, 45L, 205L))
    def neighbors(nprobe: Int): Map[Long, Set[Long]] =
      Similarity.knnJoin(left, "vec_id", "embedding",
          clusteredDf, "vec_id", "embedding", k = 10, nlist = 8,
          nprobe = nprobe, iters = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = neighbors(8)
    val ann = neighbors(2)
    exact.foreach { case (q, truth) =>
      val recall = truth.intersect(ann.getOrElse(q, Set.empty)).size / 10.0
      assert(recall >= 0.9, s"query $q recall $recall")
    }
  }

  test("knnJoinWithIndex amortizes training: float and SQ8 indexes both serve joins") {
    val left = clusteredDf.filter($"vec_id".isin(5L, 45L, 205L))
    def truth(qid: Long): Set[Long] = {
      val qv = clustered.find(_._1 == qid).get._2
      Similarity.cosineTopK(clusteredDf, "vec_id", "embedding", qv, 10)
        .select("vec_id").as[Long].collect().toSet
    }
    Seq(false, true).foreach { quantized =>
      val idx = java.nio.file.Files.createTempDirectory("graft-knn-idx").toString
      if (quantized)
        Similarity.ivfWriteIndexQuantized(clusteredDf, "vec_id", "embedding",
          idx, nlist = 8, iters = 5)
      else
        Similarity.ivfWriteIndex(clusteredDf, "vec_id", "embedding", idx,
          nlist = 8, iters = 5)
      val got = Similarity.knnJoinWithIndex(left, "vec_id", "embedding",
          idx, "vec_id", k = 10, nprobe = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
      got.foreach { case (q, ns) =>
        val recall = truth(q).intersect(ns).size / 10.0
        assert(recall >= 0.9, s"quantized=$quantized query $q recall $recall")
      }
    }
  }

  test("int8 quantization: codes in range, error <= scale/2, zeros exact") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(100.0f, -100.0f, 50.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (4L, Array(1e-8f, -1e-8f, 0.0f, 0.0f))) // denormal-ish
    val df = vecs.toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions.col
    val got = df
      .withColumn("q", Similarity.quantizeInt8(col("embedding")))
      .withColumn("deq", Similarity.dequantizeInt8(col("q")))
      .select("vec_id", "embedding", "q.scale", "q.codes", "deq")
      .as[(Long, Seq[Float], Float, Seq[Byte], Seq[Float])]
      .collect().sortBy(_._1)
    got.foreach { case (id, orig, scale, codes, deq) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id codes")
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= scale / 2 * 1.000001f,
          s"vec $id: |$o - $d| > ${scale / 2}")
      }
    }
    val zero = got.find(_._1 == 3L).get
    assert(zero._3 == 0.0f && zero._5.forall(_ == 0.0f)) // exact zeros back
    // max-magnitude element always quantizes to +/-127 (full range used)
    assert(got.find(_._1 == 2L).get._4.map(_.toInt).max == 127)
  }

  test("single-pass seed pools reproduce the per-subspace TakeOrdered pools " +
      "exactly (rows AND order)") {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val m = 4; val poolK = 16; val seed = 42L
    val onePass = Similarity.seedPools(clusteredDf, "vec_id", "embedding",
      (0 until m).map(seed + _), poolK)
    val perSubspace = (0 until m).map { j =>
      clusteredDf
        .select(col("vec_id").cast("long").as("_cid"),
          col("embedding").as("_cv"))
        .orderBy(xxhash64(col("_cid"), lit(seed + j)))
        .limit(poolK)
        .collect()
        .map(_.getSeq[Float](1).toArray)
        .toSeq
    }
    assert(onePass.size == m)
    (0 until m).foreach { j =>
      assert(onePass(j).size == poolK)
      assert(onePass(j).map(_.toSeq) == perSubspace(j).map(_.toSeq),
        s"pool $j diverged from the TakeOrdered spelling")
    }
  }

  test("PQ: codes are in range, ADC + exact re-rank recovers brute-force " +
      "top-k on clustered data") {
    val cb = Similarity.pqTrain(clusteredDf, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 3)
    assert(cb.size == 4 && cb.forall(_.size == 16) &&
      cb.forall(_.forall(_.length == 4)))
    val enc = Similarity.pqEncode(clusteredDf, "embedding", cb)
    val codes = enc.select("_pq_code").as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.size == 4 && cs.forall(c => c >= 0 && c < 16)))

    val q = clustered(45)._2
    val truth = Similarity.cosineTopK(clusteredDf, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val got = Similarity.pqTopKAdc(enc, "vec_id", "embedding", q, cb,
      k = 10, refine = 40)
      .select("vec_id").as[Long].collect().toSet
    val recall = (truth & got).size / 10.0
    assert(recall >= 0.9, s"PQ recall@10 = $recall (truth $truth, got $got)")
  }

  test("IVF-PQ index: codes-only storage, ADC probe + SQ8 refine holds " +
      "recall, PQ appends encode with the stored codebooks") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.ivfWriteIndexPq(clusteredDf, "vec_id", "embedding", idx,
      nlist = 8, m = 4, ksub = 16, iters = 2)
    val q = clustered(45)._2
    val truth = Similarity.cosineTopK(clusteredDf, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val got = Similarity.ivfProbePq(spark, idx, "vec_id", "embedding", q,
      k = 10, nprobe = 3, refine = 40)
      .select("vec_id").as[Long].collect().toSet
    val recall = (truth & got).size / 10.0
    assert(recall >= 0.9, s"IVF-PQ recall@10 = $recall")
    // stored rows carry codes only — no float vector column
    val stored = new graft.store.TableStore(
      new org.apache.hadoop.fs.Path(idx), spark).schema("ivf")
    assert(stored.fieldNames.toSet ==
      Set("vec_id", "_pq_code", "_q8", "_ivf_list"))
    // appends inherit the PQ layout and are recalled by the probe
    val extra = Seq((9000L, clustered(45)._2.map(x => x + 0.001f)))
      .toDF("vec_id", "embedding")
    Similarity.ivfAppend(extra, "vec_id", "embedding", idx)
    val got2 = Similarity.ivfProbePq(spark, idx, "vec_id", "embedding", q,
      k = 3, nprobe = 3, refine = 20)
      .select("vec_id").as[Long].collect().toSet
    assert(got2.contains(9000L), s"appended near-dup must surface: $got2")
  }

  test("PQ ADC selection never touches the vectors; re-rank is candidate-sized") {
    val cb = Similarity.pqTrain(clusteredDf, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 1)
    val enc = Similarity.pqEncode(clusteredDf, "embedding", cb)
      .select($"vec_id", $"embedding", $"_pq_code")
    val q = clustered(5)._2
    val plan = Similarity.pqTopKAdc(enc, "vec_id", "embedding", q, cb,
      k = 5, refine = 20)
      .queryExecution.executedPlan.toString
    // candidate selection and final rank both plan bounded top-k
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Exchange hash"),
      plan)
  }
}
