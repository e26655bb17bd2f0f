package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusClean, CorpusStats, Dedup, FramePool, Logit, OperatorCaches, Quality}

/** The end-to-end corpus refinery — the one-call user story this library
  * exists for: raw document corpus in, audited training shards out.
  *
  *   1. gate → near-exact dedup → benchmark decontamination
  *      ([[CorpusClean.clean]] — the q148 composite);
  *   2. containment pass: drop documents ≥ `minContainment` contained in
  *      ANY other document that is larger (or equal-sized with a smaller
  *      id — the acyclic tie rule, same as the streaming ingest filter).
  *      Note the rule is deliberately non-recursive: in an A⊂B⊂C chain
  *      where B is itself dropped, A still drops — at high thresholds
  *      containment chains are near-transitive, so A's content is (close
  *      to) represented by the surviving C, and the one-pass rule is a
  *      single capped posting join where a keep-only-if-container-
  *      survives rule would need a sized fixpoint iteration;
  *   2b. classifier gate (optional, [[QualityGate]]): score every
  *      surviving document through the TRAINED serving model
  *      ([[graft.operators.Logit.servingModel]] — the q278 trajectory
  *      at the q279 holdout-selected round) and keep z ≥ the q141-
  *      derived operating point ([[graft.operators.Logit.maxF1Threshold]])
  *      — the end-to-end train → validate → calibrate → gate recipe a
  *      100 TB curation deployment actually runs;
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
  * application. Cache convention (the codebase-wide one Verify/Bench
  * follow — one pipeline at a time per session): the run releases BOTH
  * the per-query operator caches and the cross-query frame pool before
  * returning, so nothing corpus-sized stays persisted; interleave other
  * pipelines' cached frames across a run at your own cost (they recompute
  * on next use).
  */
object Refinery {

  /** The classifier stage's configuration: a trained serving model and
    * the fixed-point z cutoff (keep = z ≥ minScore — derive it from
    * the q141 sweep via [[graft.operators.Logit.maxF1Threshold]], or
    * set a target keep-rate cutoff). */
  final case class QualityGate(model: Logit.Model, minScore: Long)

  final case class Report(nInput: Long, nCleaned: Long, nCurated: Long,
                          nQualityKept: Long,
                          cardPath: String, curriculumPath: String,
                          export: TrainingExport.Result)

  def run(spark: SparkSession, docs: DataFrame, benchmark: DataFrame,
          outDir: String, nShards: Int = 4,
          idCol: String = "doc_id", textCol: String = "text",
          sourceCol: String = "source",
          minTokens: Int = 10, maxTokens: Int = 1000,
          minContainment: Double = 0.8,
          quality: Option[QualityGate] = None): Report = {
    val nInput = docs.count()
    val cleaned = CorpusClean.clean(docs, benchmark, idCol, textCol,
      minTokens, maxTokens)
    // contained is persisted (id-sized): counted once for the report and
    // reused by the anti-join without re-running the posting join
    val contained = OperatorCaches.persistTracked(
      Dedup.containmentPairs(cleaned, idCol, textCol,
          k = 3, minContainment = minContainment)
        .filter(col("na") < col("nb") ||
          (col("na") === col("nb") && col("a_id") > col("b_id")))
        .select(col("a_id").as(idCol)).distinct())
    val deduped = OperatorCaches.persistTracked(
      cleaned.join(contained, Seq(idCol), "left_anti"))
    // classifier stage: score through the TRAINED serving model and
    // gate at the configured operating point — the train (q278) →
    // select round (q279) → pick threshold (q141) → gate recipe,
    // composed. A per-row projection: no shuffle, no extra pass beyond
    // the filter itself.
    val curated = quality match {
      case Some(QualityGate(model, minScore)) =>
        OperatorCaches.persistTracked(
          Logit.scoreCorpus(deduped, model, idCol, textCol)
            .filter(col("z") >= minScore).drop("z"))
      case None => deduped
    }
    try {
      val nQualityKept = curated.count()
      // without a gate, curated IS the post-containment frame — reuse
      // the count instead of a second action over the same frame
      val nCurated =
        if (quality.isDefined) deduped.count() else nQualityKept
      // cleaned = deduped ∪ contained (the anti-join's exact complement)
      // — derived instead of paying a third full gate→dedup→decontam pass
      val nCleaned = nCurated + contained.count()
      val cardPath = s"$outDir/dataset_card.csv"
      graft.operators.Convert.csvSingleFile(
        CorpusStats.datasetCard(curated, sourceCol, textCol)
          .orderBy("source"), cardPath)
      val curriculumPath = s"$outDir/curriculum"
      Quality.curriculumOrder(curated, idCol, sourceCol, textCol)
        .orderBy("src_rank", "source", idCol)
        .write.mode("overwrite").parquet(curriculumPath)
      val export = TrainingExport.run(spark, curated, idCol, textCol,
        s"$outDir/train", nShards)
      Report(nInput, nCleaned, nCurated, nQualityKept, cardPath,
        curriculumPath, export)
    } finally {
      OperatorCaches.release()
      // containmentPairs pools the cleaned corpus's shingle sets in
      // FramePool — corpus-sized, must not outlive the pipeline
      FramePool.release()
    }
  }
}
