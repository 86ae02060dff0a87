package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal (the RefinedWeb/C4 line-dedup
  * pass): a line whose normalized form appears in at least `minDocFreq`
  * distinct documents is template chrome (nav bars, cookie banners,
  * "subscribe" footers) and is dropped from every document.
  *
  * Shape at scale: explode to (doc, position, line) → one
  * partial-aggregated `groupBy` over the normalized line to find
  * frequent lines (distinct doc count, not occurrence count, so one doc
  * repeating its own line is untouched) → anti-join → reassemble each
  * document in original line order via sort_array(collect_list). Two
  * shuffles total (line-frequency agg + per-doc regroup); nothing
  * collects to the driver.
  */
object Boilerplate {

  def removeFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int = 5): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2: $minDocFreq")
    val lines = docs
      .select(col(idCol).as("_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
      .withColumn("_nl", TextAnalysis.normalize(col("_line")))
    val frequent = lines
      .select(col("_id"), col("_nl")).distinct() // count docs, not occurrences
      .groupBy("_nl").agg(count(lit(1)).as("_docs"))
      .filter(col("_docs") >= minDocFreq && col("_nl") =!= "")
      .select("_nl")
    lines
      .join(frequent, Seq("_nl"), "left_anti")
      .groupBy("_id")
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("_pos"), col("_line")))),
          s => s.getField("_line")),
        "\n").as("_clean"),
        count(lit(1)).as("n_lines_kept"))
      .select(col("_id").as(idCol), col("_clean").as(textCol),
        col("n_lines_kept"))
  }
}
