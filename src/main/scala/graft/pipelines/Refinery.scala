package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusClean, CorpusStats, Dedup, OperatorCaches, Quality}

/** The end-to-end corpus refinery — the one-call user story this library
  * exists for: raw document corpus in, audited training shards out.
  *
  *   1. gate → near-exact dedup → benchmark decontamination
  *      ([[CorpusClean.clean]] — the q148 composite);
  *   2. containment pass: drop documents that are subsets/quotes of a
  *      STRICTLY larger surviving document (acyclic keep rule — the
  *      q155 operator applied as a filter);
  *   3. dataset card: the per-source volume/duplication/novelty report
  *      ([[CorpusStats.datasetCard]], q167) written as one CSV — the
  *      artifact a curation review reads;
  *   4. curriculum: per-source quality ranks ([[Quality.curriculumOrder]],
  *      q169) written as parquet, ordered source-balanced best-first;
  *   5. training shards: deterministic hash-shuffled, self-audited
  *      export ([[TrainingExport.run]]).
  *
  * Every stage is the oracle-gated operator the registry proves —
  * RefinerySpec checks the composite against the stage-by-stage batch
  * application. The curated frame is persisted once (consumed by the
  * card, the curriculum, and the export) and released before return.
  */
object Refinery {

  final case class Report(nInput: Long, nCleaned: Long, nCurated: Long,
                          cardPath: String, curriculumPath: String,
                          export: TrainingExport.Result)

  def run(spark: SparkSession, docs: DataFrame, benchmark: DataFrame,
          outDir: String, nShards: Int = 4,
          minTokens: Int = 10, maxTokens: Int = 1000,
          minContainment: Double = 0.8): Report = {
    val nInput = docs.count()
    val cleaned = CorpusClean.clean(docs, benchmark, "doc_id", "text",
      minTokens, maxTokens)
    val contained = Dedup.containmentPairs(cleaned, "doc_id", "text",
        k = 3, minContainment = minContainment)
      .filter(col("na") < col("nb") ||
        (col("na") === col("nb") && col("a_id") > col("b_id")))
      .select(col("a_id").as("doc_id")).distinct()
    val curated = OperatorCaches.persistTracked(
      cleaned.join(contained, Seq("doc_id"), "left_anti"))
    try {
      val nCleaned = cleaned.count()
      val nCurated = curated.count()
      val cardPath = s"$outDir/dataset_card.csv"
      graft.operators.Convert.csvSingleFile(
        CorpusStats.datasetCard(curated, "source", "text")
          .orderBy("source").coalesce(1), cardPath)
      val curriculumPath = s"$outDir/curriculum"
      Quality.curriculumOrder(curated, "doc_id", "source", "text")
        .orderBy("src_rank", "source", "doc_id")
        .write.mode("overwrite").parquet(curriculumPath)
      val export = TrainingExport.run(spark, curated, "doc_id", "text",
        s"$outDir/train", nShards)
      Report(nInput, nCleaned, nCurated, cardPath, curriculumPath, export)
    } finally OperatorCaches.release()
  }
}
