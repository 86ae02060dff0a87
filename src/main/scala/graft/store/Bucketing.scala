package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for co-located joins.
  *
  * A fact table repeatedly joined on the same key should be written
  * bucketed by that key: both sides of a bucket-aligned join read
  * pre-partitioned data and the sort-merge join runs with NO shuffle
  * exchange — at 100 TB the difference between re-shuffling the fact
  * table per query and reading it join-ready. (The snapshot store keeps
  * plain Parquet; bucketing is the complementary layout for the
  * hot-join-key tables, via the session catalog.)
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) table. `path`
    * makes it an external table — data lives where the caller says,
    * catalog holds only metadata. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans without
    * a shuffle on either side when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
