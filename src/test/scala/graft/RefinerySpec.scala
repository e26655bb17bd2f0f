package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

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
}
