package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{FramePool, Logit}
import graft.pipelines.Refinery

/** The end-to-end refinery composite: every planted defect class is
  * removed by its stage, the artifacts audit themselves, and the counts
  * reconcile across stages. */
class RefinerySpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private def doc(seed: Int, n: Int = 40): String = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
  }

  test("refinery drops each planted defect at its stage; artifacts reconcile") {
    val tmp = Files.createTempDirectory("refinery").toString
    val benchmark = Seq((900L, doc(900, 30))).toDF("doc_id", "text")
    val keeper = doc(1, 60)
    val docs = (Seq(
      (1L, keeper, "srcA"),
      (2L, doc(2), "srcA"),
      (3L, doc(3), "srcB"),
      (4L, doc(4), "srcB"),
      (5L, doc(2), "srcB"),                                  // exact dup of 2 → dropped
      (6L, "tiny", "srcA"),                                  // fails the token gate
      (7L, doc(900, 30), "srcB"),                            // benchmark-contaminated
      (8L, keeper.split(" ").slice(20, 35).mkString(" "), "srcA")) // chunk of 1 → containment
      ++ (10 until 20).map(i => (i.toLong, doc(100 + i), if (i % 2 == 0) "srcA" else "srcB")))
      .toDF("doc_id", "text", "source")
    val report = Refinery.run(spark, docs, benchmark, tmp, nShards = 2)

    assert(report.nInput === 18)
    // gate drops 6, dedup drops 5, decontamination drops 7
    assert(report.nCleaned === 15)
    // containment drops 8
    assert(report.nCurated === 14)
    val shardIds = spark.read.parquet(s"$tmp/train/shards")
      .select("doc_id").as[Long].collect().toSet
    assert(shardIds.size === 14)
    assert(!shardIds.contains(5L) && !shardIds.contains(6L) &&
      !shardIds.contains(7L) && !shardIds.contains(8L))
    assert(shardIds.contains(1L) && shardIds.contains(2L))

    // artifacts: card has one row per surviving source; curriculum covers
    // every curated doc; the manifest's row total equals the curated count
    val card = spark.read.option("header", "true").csv(report.cardPath)
    assert(card.select("source").as[String].collect().toSet === Set("srcA", "srcB"))
    val curriculum = spark.read.parquet(report.curriculumPath)
    assert(curriculum.count() === 14)
    assert(curriculum.select("doc_id").as[Long].collect().toSet === shardIds)
    assert(report.export.shards.map(_._2).sum === 14L)
  }

  test("classifier gate: boilerplate-injected docs dropped, clean docs " +
    "kept, funnel reconciles — the trained train→select→threshold→gate " +
    "recipe composed end-to-end") {
    val tmp = Files.createTempDirectory("refineryq").toString
    // the TRAINED deployment pieces: served model (q278 trajectory at
    // the q279-selected round) + the q141-derived max-F1 cutoff
    val model = Logit.servingModel(spark, sfDir)
    val thr = Logit.maxF1Threshold(spark, sfDir)
    // input corpus: real fixture docs (the clean profile the model was
    // trained on), with HEAVY boilerplate injected into every 3rd —
    // the defect class the quality classifier exists to drop
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
      .withColumn("__ntok", size(split(col("text"), " ")))
      .filter(col("__ntok").between(50, 400)).drop("__ntok")
      .orderBy("doc_id").limit(24)
    val spamTail = (" " + Logit.SpamLine) * 12
    val docs = base.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit(spamTail))).otherwise(col("text")).as("text"),
      col("source"))
    val benchmark = Seq((999999L,
      "an unrelated benchmark passage about nothing in particular at all"))
      .toDF("doc_id", "text")
    val report = Refinery.run(spark, docs, benchmark, tmp, nShards = 2,
      quality = Some(Refinery.QualityGate(model, thr)))
    // the pre-classifier survivor set, recomputed stage-by-stage with
    // the same batch operators (the fixture carries planted near-dup
    // structure, so a few base docs can legitimately fall earlier —
    // the funnel must reconcile against the ACTUAL stage outputs)
    val cleaned = graft.operators.CorpusClean.clean(
      docs, benchmark, "doc_id", "text")
    val contained = graft.operators.Dedup.containmentPairs(
        cleaned, "doc_id", "text", k = 3, minContainment = 0.8)
      .filter(col("na") < col("nb") ||
        (col("na") === col("nb") && col("a_id") > col("b_id")))
      .select(col("a_id").as("doc_id")).distinct()
    val survivors = cleaned.join(contained, Seq("doc_id"), "left_anti")
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet
    assert(report.nInput === 24)
    assert(report.nCurated === survivorIds.size.toLong)
    val shardIds = spark.read.parquet(s"$tmp/train/shards")
      .select("doc_id").as[Long].collect().toSet
    assert(report.nQualityKept === shardIds.size.toLong)
    // the CONTRACT: kept = exactly the z ≥ threshold subset of the
    // pre-gate survivors (independently recomputed through scoreCorpus)
    val expectKept = Logit.scoreCorpus(survivors, model)
      .filter(col("z") >= thr).select("doc_id").as[Long].collect().toSet
    assert(shardIds === expectKept)
    // the SEMANTICS: every boilerplate-injected doc is gone...
    val injected = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(injected.nonEmpty && injected.forall(id => !shardIds.contains(id)),
      s"injected docs survived the gate: ${injected intersect shardIds}")
    // ...and the clean majority survives
    val clean = survivorIds -- injected
    val keptClean = clean intersect shardIds
    assert(keptClean.size * 2 >= clean.size,
      s"gate dropped most CLEAN docs (${keptClean.size}/${clean.size})")
    FramePool.release()
  }
}
