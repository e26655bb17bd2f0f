package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction over a document table — the retrieval-side
  * counterpart of the dedup/quality operators: term → document statistics
  * (document frequency, total term frequency, the top-scoring posting).
  *
  * Scale shape: tokenize-explode streams out of the scan (no shuffle),
  * then ONE shuffle keyed by (term, doc) with map-side partial counts,
  * then a window + aggregation both keyed by term — Spark reuses the
  * term hash partitioning between the window and the final aggregate, so
  * the whole index is two exchanges end to end. Posting-list payloads
  * stay distributed; nothing term-level ever collects to the driver.
  */
object InvertedIndex {

  /** Per-term index statistics: `doc_freq` (postings count), `total_tf`
    * (corpus-wide occurrences), and the deterministic top posting
    * (`top_doc`, `top_tf`: highest tf, ties to the smallest id — the
    * entry a tf-ranked posting list serves first). `minDf` prunes the
    * long tail of hapax terms (at corpus scale most of the vocabulary),
    * applied AFTER aggregation so the stats themselves are exact. */
  def termStats(docs: DataFrame, idCol: String, textCol: String,
                minDf: Long = 2L): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("term")).orderBy(desc("tf"), col(idCol))
    tf.withColumn("rn", row_number().over(w))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"),
        sum(col("tf")).as("total_tf"),
        max(when(col("rn") === 1, col(idCol))).as("top_doc"),
        max(when(col("rn") === 1, col("tf"))).as("top_tf"))
      .filter(col("doc_freq") >= minDf)
  }
}
