package graft

import org.apache.spark.sql.functions._

import graft.operators.{FramePool, Logit}

/** Trained quality classifier: fixed-point exactness vs the sequential
  * reference trainer, the persist→serve artifact contract (the Bpe
  * pattern: round trip bit-equal, truncation fails loudly), and the
  * semantic floor — the served model actually separates the planted
  * boilerplate axis it was trained on. */
class LogitSpec extends SparkSpec {
  import spark.implicits._

  private def feat = Logit.pooledFeatures(spark, sfDir)

  test("distributed trajectory equals the sequential reference trainer") {
    val rows = feat.select("x0", "x1", "x2", "x3", "y")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val expected = Logit.referenceTrain(rows, Logit.Rounds, Logit.LrDen)
    val got = Logit.trainTrajectory(feat, Logit.Rounds, Logit.LrDen)
    assert(got === expected) // every round's 4 weights, bit for bit
    // training moved: final round differs from zero in every feature
    val w = got.last
    assert(w.w0 != 0L && w.w1 != 0L && w.w2 != 0L && w.w3 != 0L)
  }

  test("weights artifact round-trips; truncated artifact fails loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("logitart").toString
    val traj = Logit.pooledTrajectory(spark, sfDir)
    val servedRound = Logit.selectedRound(spark, sfDir)
    Logit.save(spark, traj, servedRound, s"$tmp/w")
    val loaded = Logit.load(spark, s"$tmp/w")
    assert(loaded.trajectory === traj) // rounds AND weights survive
    assert(loaded.servedRound === servedRound) // the selection travels too
    // serve-from-artifact: scoring through the loaded SERVED round is
    // bit-equal to scoring through the in-memory serving weights
    def score(w: Logit.Weights) =
      feat.select(col("doc_id"), Logit.zExpr(w).as("z"))
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(score(loaded.served) === score(Logit.servingWeights(spark, sfDir)))
    // a trajectory with a hole (round 2 dropped) is a DIFFERENT model
    // (the served vector is a specific round of a specific training
    // order): load must fail loudly, never mis-score
    spark.createDataFrame(traj.filterNot(_.round == 2L)
        .map(w => (w.round, w.w0, w.w1, w.w2, w.w3, w.round == servedRound)))
      .toDF("round", "w0", "w1", "w2", "w3", "served")
      .write.mode("overwrite").parquet(s"$tmp/bad")
    val ex = intercept[IllegalArgumentException] {
      Logit.load(spark, s"$tmp/bad")
    }
    assert(ex.getMessage.contains("not contiguous"))
    // an artifact with ZERO served rounds (or two) is ambiguous: the
    // consumer cannot know which vector gates keep/drop — loud failure
    spark.createDataFrame(traj.map(w => (w.round, w.w0, w.w1, w.w2, w.w3,
        false)))
      .toDF("round", "w0", "w1", "w2", "w3", "served")
      .write.mode("overwrite").parquet(s"$tmp/noserve")
    val ex3 = intercept[IllegalArgumentException] {
      Logit.load(spark, s"$tmp/noserve")
    }
    assert(ex3.getMessage.contains("ambiguous"))
    // empty trajectories never persist; nor does an out-of-range pick
    val ex2 = intercept[IllegalArgumentException] {
      Logit.save(spark, Seq.empty, 1L, s"$tmp/empty")
    }
    assert(ex2.getMessage.contains("empty"))
    val ex4 = intercept[IllegalArgumentException] {
      Logit.save(spark, traj, traj.length + 7L, s"$tmp/oob")
    }
    assert(ex4.getMessage.contains("not in trajectory"))
  }

  test("a planted trajectory whose holdout AUC peaks at round 2 serves " +
    "round 2 (q279's actuator)") {
    // Planted holdout: x1 alone separates the classes perfectly
    // (positives at x1 = +G, negatives at x1 = -G). Trajectory: round 1
    // ignores the signal (bias only — AUC 0.5 on a single score),
    // round 2 weights x1 POSITIVELY (perfect ranking, AUC = 1), rounds
    // 3 and 4 flip the sign (anti-ranking, AUC = 0) — the overfit
    // shape the selection exists to catch. Selection must pick 2, not
    // the last round.
    val g = Logit.Grid
    val hold = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) 1L else 0L, g,
        if (i % 2 == 0) g else -g, 0L, 0L))
      .toDF("doc_id", "y", "x0", "x1", "x2", "x3")
    val planted = Seq(
      Logit.Weights(1L, 100L, 0L, 0L, 0L),
      Logit.Weights(2L, 0L, 1000000L, 0L, 0L),
      Logit.Weights(3L, 0L, -1000000L, 0L, 0L),
      Logit.Weights(4L, 0L, -2000000L, 0L, 0L))
    val curve = Logit.holdoutAuc(hold, planted)
      .orderBy("round")
      .select("round", "auc_bp")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    assert(curve.map(_._2) ===
      Seq(Some(5000L), Some(10000L), Some(0L), Some(0L)))
    assert(Logit.selectServedRound(curve) === 2L)
    // ties break toward the LATER round (more training, equal quality)
    assert(Logit.selectServedRound(
      Seq((1L, Some(7000L)), (2L, Some(7000L)), (3L, Some(6000L)))) === 2L)
    // all-null curve (single-class holdout) refuses to pick
    val exn = intercept[IllegalArgumentException] {
      Logit.selectServedRound(Seq((1L, None), (2L, None)))
    }
    assert(exn.getMessage.contains("refusing"))
  }

  test("servingWeights is the holdout-selected round of the full " +
    "trajectory, and scoredDocs scores through it") {
    val traj = Logit.pooledTrajectory(spark, sfDir)
    val sel = Logit.selectedRound(spark, sfDir)
    val w = Logit.servingWeights(spark, sfDir)
    assert(w.round === sel)
    assert(traj.find(_.round == sel).contains(w))
    // the consumers' one scored frame uses exactly these weights
    val viaScored = Logit.scoredDocs(spark, sfDir)
      .orderBy("doc_id").select("doc_id", "z")
      .as[(Long, Long)].collect().toSeq
    val direct = feat.select(col("doc_id"), Logit.zExpr(w).as("z"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(viaScored === direct)
  }

  test("served model separates the planted axis (AUC well above chance)") {
    val w = Logit.pooledTrajectory(spark, sfDir).last
    val scored = feat.select(Logit.zExpr(w).as("z"), col("y"))
    // exact Mann–Whitney AUC of z as a keep-score for the clean class
    val rows = scored.as[(Long, Long)].collect()
    val pos = rows.filter(_._2 == 1L).map(_._1).sorted
    val neg = rows.filter(_._2 == 0L).map(_._1).sorted
    assert(pos.nonEmpty && neg.nonEmpty)
    var u = 0.0
    pos.foreach { p =>
      val lo = neg.count(_ < p); val eq = neg.count(_ == p)
      u += lo + eq * 0.5
    }
    val auc = u / (pos.length.toDouble * neg.length.toDouble)
    assert(auc > 0.65, s"trained AUC $auc — model failed to learn the axis")
    FramePool.release()
  }
}
