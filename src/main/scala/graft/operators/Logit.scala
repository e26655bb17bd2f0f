package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine TRAINING for the linear quality classifier — the model
  * half of the classifier-evaluation trio (q141 threshold sweep, q220
  * AUC, q235 calibration). Every other trained state in the engine
  * (BPE merges, k-means/PQ codebooks, IVF cells) already follows
  * train → persist → serve; this closes the last gap: the quality
  * logit the trio evaluates is now PRODUCED by the engine, not a set
  * of hand-fixed literals.
  *
  * Reference scope: the reference repo has no model training
  * (`utils.py` is scan/convert/pivot plumbing); this operator is part
  * of the LLM-data-pipeline extension surface — fastText/logreg-style
  * quality filters are the standard curation recipe step the engine's
  * evaluation queries already assume.
  *
  * Exactness contract (the q137 PageRank / q35 Lloyd-step discipline):
  * every arithmetic step is BIGINT on the 10⁶ fixed-point grid with
  * trunc-toward-zero integer division (`DIV` in Spark ≡ `//` in
  * DuckDB), so a T-round training trajectory hash-matches an unrolled
  * T-layer CTE oracle bit for bit. Float gradient descent never could
  * — partition-order-dependent double sums.
  *
  * Model: logistic regression under the HARD-sigmoid link
  * σ̂(z) = clamp(½ + z/4, 0, 1) — the piecewise-linear sigmoid
  * (Hinton's "noisy-or" surrogate, standard in quantized training),
  * chosen because exp() is engine-private libm territory while the
  * clamp is exact on the grid. Batch gradient descent:
  *   e_i = σ̂(z_i)·G − y_i·G,  g_j = Σ_i (e_i·x_ij) DIV G,
  *   w_j ← w_j − ((g_j DIV n) DIV lrDen).
  *
  * Features are CENTERED (fixed-point global means subtracted) — with
  * raw all-positive features the batch gradient is dominated by the
  * shared feature-mean direction and the discriminative component
  * drowns (measured: AUC 0.28 uncentered vs 0.73 centered on the
  * planted axis at every SF).
  *
  * Training labels come from a PLANTED low-quality axis (the q272
  * code-wrap / q69 PII injection discipline): docs with
  * doc_id % 5 = 0 get a boilerplate spam line appended 1+(doc_id%3)
  * times — duplicated boilerplate, the thing quality filters exist to
  * down-rank — and the fixture's token-length/stop-word profile makes
  * the axis genuinely learnable (trained AUC ≈ 0.73 at sf0.001/0.01/
  * 0.1, vs 0.5 for any label the raw synthetic fixture carries).
  *
  * Scale shape: one aggregation per round over the id-sized feature
  * frame (map-side combined, 4 longs + a count per round to the
  * driver — the Lloyd-step driver-traffic bound); the feature frame is
  * FramePool-persisted so T rounds + every serving query pay the text
  * scan once. Per-row gradient terms are ≤ 10⁷ in magnitude, so BIGINT
  * sums hold to ~10¹¹ docs; |w| stays ≤ rounds·10⁷ and the z products
  * ≤ 10¹⁴ — no overflow at any plausible corpus size.
  */
object Logit {

  /** Fixed-point grid: 10⁶ (weights, features, sigmoid all live here). */
  val Grid = 1000000L

  /** The planted boilerplate line (stopword-free on purpose — it
    * dilutes stop_frac and shifts mean token length, the features). */
  val SpamLine = "buy cheap pills online now limited offer click here win big deal"

  /** Default training rounds / learning rate 1/lrDen — 4 unrolled
    * CTE layers keep the oracle readable; the ranking direction
    * stabilizes after round 1 and the weights keep scaling. */
  val Rounds = 4
  val LrDen = 2L

  final case class Weights(round: Long, w0: Long, w1: Long, w2: Long, w3: Long)

  /** Plant the low-quality axis: doc_id % 5 = 0 docs get the spam line
    * appended 1+(doc_id%3) times; label y = 1 for clean ("keep"), 0 for
    * boilerplate. Oracle twin: the `aug` CTE in LogitOracle. */
  def augment(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"),
          expr(s"repeat(' $SpamLine', CAST(pmod(doc_id, 3) + 1 AS INT))")))
        .otherwise(col("text")).as("text"),
      when(pmod(col("doc_id"), lit(5)) === 0, 0L).otherwise(1L).as("y"))

  /** Centered fixed-point feature frame (doc_id, y, x0..x3):
    * x0 = G (bias), x1 = (n_tok/100)·G, x2 = stop_frac·G,
    * x3 = (mean_len/10)·G, each minus its fixed-point mean (bias
    * uncentered). `trainCond` restricts the MEAN computation to the
    * training split (the proper holdout discipline — centering
    * statistics are model state and must never see evaluation rows);
    * every row is still centered and returned, so holdout rows score
    * through train-fitted statistics. n_chars is length(text) — the
    * augmented text, not the fixture column. One collect of 3 means
    * (bounded). */
  def features(aug: DataFrame,
               trainCond: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val raw = aug
      .select(col("doc_id"), col("y"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        size(filter(split(col("text"), " "),
          x => x.isin("a", "the", "of", "to"))).cast("long").as("n_stop"),
        length(col("text")).cast("long").as("n_chars"))
      .select(col("doc_id"), col("y"), col("n_chars"),
        expr(s"n_tok * $Grid DIV 100").as("r1"),
        expr(s"n_stop * $Grid DIV n_tok").as("r2"),
        expr(s"(n_chars - (n_tok - 1)) * $Grid DIV (n_tok * 10)").as("r3"))
    val m = raw.filter(trainCond).agg(
      expr("sum(r1) DIV count(*)").as("m1"),
      expr("sum(r2) DIV count(*)").as("m2"),
      expr("sum(r3) DIV count(*)").as("m3")).head()
    raw.select(col("doc_id"), col("y"), col("n_chars"), lit(Grid).as("x0"),
      (col("r1") - lit(m.getLong(0))).as("x1"),
      (col("r2") - lit(m.getLong(1))).as("x2"),
      (col("r3") - lit(m.getLong(2))).as("x3"))
  }

  /** Pooled feature frame for a corpus dir — training rounds and every
    * serving query share one persisted copy (the pq-trained pattern). */
  def pooledFeatures(spark: SparkSession, sfDir: String): DataFrame =
    FramePool.frames(s"logit-features:$sfDir") {
      Seq(features(augment(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text")))))
    }.head

  /** The fixed-point linear logit z = (w·x) DIV G as a column
    * expression over a [[features]]-shaped frame. */
  def zExpr(w: Weights): org.apache.spark.sql.Column =
    expr(s"(${w.w0}L * x0 + ${w.w1}L * x1 + ${w.w2}L * x2 + ${w.w3}L * x3) " +
      s"DIV $Grid")

  /** T rounds of batch GD; returns the full trajectory (round 1..T).
    * Driver traffic: one 4-long row per round. */
  def trainTrajectory(feat: DataFrame, rounds: Int = Rounds,
                      lrDen: Long = LrDen): Seq[Weights] = {
    require(rounds >= 1 && lrDen >= 1,
      s"Logit.trainTrajectory: rounds=$rounds lrDen=$lrDen")
    var w = Weights(0L, 0L, 0L, 0L, 0L)
    val out = Seq.newBuilder[Weights]
    for (r <- 1 to rounds) {
      val zs = s"(${w.w0}L * x0 + ${w.w1}L * x1 + ${w.w2}L * x2 + " +
        s"${w.w3}L * x3) DIV $Grid"
      val g: Row = feat
        .withColumn("e", expr(
          s"least(${Grid}L, greatest(0L, ${Grid / 2}L + ($zs) DIV 4)) " +
            s"- y * ${Grid}L"))
        .agg(
          expr(s"sum(e * x0 DIV $Grid)").as("g0"),
          expr(s"sum(e * x1 DIV $Grid)").as("g1"),
          expr(s"sum(e * x2 DIV $Grid)").as("g2"),
          expr(s"sum(e * x3 DIV $Grid)").as("g3"),
          count(lit(1)).as("n")).head()
      val n = g.getLong(4)
      require(n > 0, "Logit.trainTrajectory: empty feature frame")
      def step(wj: Long, gj: Long): Long = {
        val perRow = gj / n // trunc: Long division truncates toward zero
        wj - perRow / lrDen
      }
      w = Weights(r.toLong, step(w.w0, g.getLong(0)), step(w.w1, g.getLong(1)),
        step(w.w2, g.getLong(2)), step(w.w3, g.getLong(3)))
      out += w
    }
    out.result()
  }

  /** Pooled trained trajectory for a corpus dir (train once, serve from
    * every consumer — q123/q141/q220/q235/q253/q278). The trajectory
    * rides the pool as a 4-row frame so release() lifecycle matches
    * every other pooled artifact. */
  def pooledTrajectory(spark: SparkSession, sfDir: String,
                       rounds: Int = Rounds, lrDen: Long = LrDen): Seq[Weights] = {
    // resolve the pooled feature frame BEFORE entering the trajectory
    // builder (FramePool is reentrant, but not nesting at all is free)
    val feat = pooledFeatures(spark, sfDir)
    val df = FramePool.frames(("logit-traj", sfDir, rounds, lrDen)) {
      val traj = trainTrajectory(feat, rounds, lrDen)
      import spark.implicits._
      Seq(traj.toDF("round", "w0", "w1", "w2", "w3").coalesce(1))
    }.head
    df.collect().map(r => Weights(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_.round).toSeq
  }

  /** Docs scored by the SERVED model (the final trained round):
    * (doc_id, y, n_chars, z) with z the fixed-point logit — the one
    * scored frame the whole evaluation trio consumes. Oracle twin:
    * LogitOracle.scored. */
  def scoredDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val w = pooledTrajectory(spark, sfDir).last
    pooledFeatures(spark, sfDir)
      .select(col("doc_id"), col("y"), col("n_chars"), zExpr(w).as("z"))
  }

  /** Persist a trained trajectory as ONE round-ordered parquet frame —
    * the artifact half of the classifier lifecycle (the Bpe.save
    * pattern). A quality filter is trained once and served by every
    * downstream keep/drop decision, usually in a different session. */
  def save(spark: SparkSession, traj: Seq[Weights], dir: String): Unit = {
    require(traj.nonEmpty, "Logit.save: empty trajectory")
    require(traj.map(_.round) == (1L to traj.length.toLong),
      "Logit.save: rounds must be contiguous 1..T in training order")
    import spark.implicits._
    traj.map(w => (w.round, w.w0, w.w1, w.w2, w.w3))
      .toDF("round", "w0", "w1", "w2", "w3")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d trajectory, re-validated LOUDLY: rounds must be
    * the contiguous 1..T training order — a truncated or reordered
    * artifact is a DIFFERENT model (the final round is the served
    * weight vector), so it fails here rather than mis-scoring every
    * downstream keep/drop decision. */
  def load(spark: SparkSession, dir: String): Seq[Weights] = {
    val out = spark.read.parquet(dir)
      .select(col("round").cast("long"), col("w0").cast("long"),
        col("w1").cast("long"), col("w2").cast("long"), col("w3").cast("long"))
      .collect()
      .map(r => Weights(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_.round).toSeq
    require(out.map(_.round) == (1L to out.length.toLong),
      s"Logit.load: rounds not contiguous 1..${out.length} — corrupt or " +
        s"truncated artifact at $dir")
    out
  }

  /** Sequential reference trainer for the spec: same fixed-point
    * arithmetic over a driver-side feature list. Never used at scale. */
  private[graft] def referenceTrain(feats: Seq[(Long, Long, Long, Long, Long)],
                                    rounds: Int, lrDen: Long): Seq[Weights] = {
    def tdiv(a: Long, b: Long): Long = a / b // JVM Long division truncates
    var w = Array(0L, 0L, 0L, 0L)
    val out = Seq.newBuilder[Weights]
    for (r <- 1 to rounds) {
      val g = Array(0L, 0L, 0L, 0L)
      feats.foreach { case (x0, x1, x2, x3, y) =>
        val z = tdiv(w(0) * x0 + w(1) * x1 + w(2) * x2 + w(3) * x3, Grid)
        val s = math.min(Grid, math.max(0L, Grid / 2 + tdiv(z, 4)))
        val e = s - y * Grid
        val xs = Array(x0, x1, x2, x3)
        for (j <- 0 to 3) g(j) += tdiv(e * xs(j), Grid)
      }
      for (j <- 0 to 3) w(j) = w(j) - tdiv(tdiv(g(j), feats.length.toLong), lrDen)
      out += Weights(r.toLong, w(0), w(1), w(2), w(3))
    }
    out.result()
  }
}
