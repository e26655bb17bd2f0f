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
    Logit.save(spark, traj, s"$tmp/w")
    val loaded = Logit.load(spark, s"$tmp/w")
    assert(loaded === traj) // rounds AND weights survive
    // serve-from-artifact: scoring through the loaded final round is
    // bit-equal to scoring through the in-memory one
    def score(w: Logit.Weights) =
      feat.select(col("doc_id"), Logit.zExpr(w).as("z"))
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(score(loaded.last) === score(traj.last))
    // a trajectory with a hole (round 2 dropped) is a DIFFERENT model
    // (the served vector is the FINAL round of a specific training
    // order): load must fail loudly, never mis-score
    spark.createDataFrame(traj.filterNot(_.round == 2L)
        .map(w => (w.round, w.w0, w.w1, w.w2, w.w3)))
      .toDF("round", "w0", "w1", "w2", "w3")
      .write.mode("overwrite").parquet(s"$tmp/bad")
    val ex = intercept[IllegalArgumentException] {
      Logit.load(spark, s"$tmp/bad")
    }
    assert(ex.getMessage.contains("not contiguous"))
    // empty trajectories never persist
    val ex2 = intercept[IllegalArgumentException] {
      Logit.save(spark, Seq.empty, s"$tmp/empty")
    }
    assert(ex2.getMessage.contains("empty"))
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
