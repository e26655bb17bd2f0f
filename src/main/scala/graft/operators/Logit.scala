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

  /** Holdout split modulus: doc_id % HoldoutMod = 0 rows are held out
    * of the validation training pass (centering means included) and
    * used to pick the SERVED round by out-of-sample AUC. */
  val HoldoutMod = 3L

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
    val raw = rawFeatures(aug)
    centered(raw, fitMeans(raw, trainCond))
  }

  /** Uncentered fixed-point features (doc_id, y, n_chars, r1, r2, r3)
    * from an [[augment]]-shaped (doc_id, text, y) frame. Pure per-row
    * map — no shuffle, no state. */
  def rawFeatures(aug: DataFrame): DataFrame =
    aug
      .select(col("doc_id"), col("y"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        size(filter(split(col("text"), " "),
          x => x.isin("a", "the", "of", "to"))).cast("long").as("n_stop"),
        length(col("text")).cast("long").as("n_chars"))
      .select(col("doc_id"), col("y"), col("n_chars"),
        expr(s"n_tok * $Grid DIV 100").as("r1"),
        expr(s"n_stop * $Grid DIV n_tok").as("r2"),
        expr(s"(n_chars - (n_tok - 1)) * $Grid DIV (n_tok * 10)").as("r3"))

  /** The fixed-point centering means over the `trainCond` split — MODEL
    * STATE: serving a doc through other means is a different model.
    * One collect of 3 longs (bounded). */
  def fitMeans(raw: DataFrame,
               trainCond: org.apache.spark.sql.Column): (Long, Long, Long) = {
    val m = raw.filter(trainCond).agg(
      expr("sum(r1) DIV count(*)").as("m1"),
      expr("sum(r2) DIV count(*)").as("m2"),
      expr("sum(r3) DIV count(*)").as("m3")).head()
    (m.getLong(0), m.getLong(1), m.getLong(2))
  }

  /** Center a [[rawFeatures]] frame with fitted means — public so the
    * streaming twin (EventStreams.servingLogit) can re-center the
    * union of its per-batch raw-feature partials with serve-time means
    * before re-training (the train-on-everything merge-closure rule). */
  def centerFeatures(raw: DataFrame, m: (Long, Long, Long)): DataFrame =
    centered(raw, m)

  private def centered(raw: DataFrame, m: (Long, Long, Long)): DataFrame =
    raw.select(col("doc_id"), col("y"), col("n_chars"), lit(Grid).as("x0"),
      (col("r1") - lit(m._1)).as("x1"),
      (col("r2") - lit(m._2)).as("x2"),
      (col("r3") - lit(m._3)).as("x3"))

  /** Pooled (features, means) pair for a corpus dir — ONE corpus scan
    * feeds both the centered frame and the 1-row means frame (the
    * serving-time model state [[servingModel]] reads back). */
  private def pooledFeatureFrames(spark: SparkSession,
                                  sfDir: String): Seq[DataFrame] =
    FramePool.frames(s"logit-features:$sfDir") {
      val raw = rawFeatures(augment(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))))
      val m = fitMeans(raw, lit(true))
      import spark.implicits._
      Seq(centered(raw, m),
        Seq(m).toDF("m1", "m2", "m3").coalesce(1))
    }

  /** Pooled feature frame for a corpus dir — training rounds and every
    * serving query share one persisted copy (the pq-trained pattern). */
  def pooledFeatures(spark: SparkSession, sfDir: String): DataFrame =
    pooledFeatureFrames(spark, sfDir).head

  /** The training corpus's centering means (model state), off the same
    * pooled scan as [[pooledFeatures]]. */
  def trainedMeans(spark: SparkSession, sfDir: String): (Long, Long, Long) = {
    val r = pooledFeatureFrames(spark, sfDir)(1).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

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

  /** Pooled HOLDOUT-disciplined feature frame: centering means fitted
    * on doc_id % HoldoutMod ≠ 0 only; every row still centered and
    * returned. Shared by q279's curve and the serving-round selection
    * (one frame, one text scan). */
  def pooledHoldoutFeatures(spark: SparkSession, sfDir: String): DataFrame =
    FramePool.frames(s"logit-features-holdout:$sfDir") {
      Seq(features(
        augment(spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))),
        pmod(col("doc_id"), lit(HoldoutMod)) =!= 0))
    }.head

  /** Exact Mann–Whitney AUC of each trajectory round on a HELD-OUT
    * frame — the learning curve (round, n_pos, n_neg, u2, auc_bp).
    * Per round: group the holdout to the distinct-score axis, one
    * distributed exclusive prefix sum of n_neg in score order, then
    * 2U = Σ n_pos·(2·cumNegBelow + n_neg) in exact longs. auc_bp is
    * assembled through DECIMAL(38,0) (oracle twin: HUGEINT) so the
    * ×10⁴ multiply cannot wrap even at u2 ≈ 2·n₊·n₋ for 10⁹-doc
    * holdouts, where a raw Long product would exceed 2⁶³ near
    * u2 ≳ 9.2·10¹⁴ — the one place q220's single-double-division
    * escape hatch doesn't apply because the curve must stay on the
    * exact integer grid for the round-selection tie rule. */
  def holdoutAuc(hold: DataFrame, traj: Seq[Weights]): DataFrame = {
    require(traj.nonEmpty, "Logit.holdoutAuc: empty trajectory")
    traj.map { w =>
      val byScore = hold
        .select(zExpr(w).as("z"), col("y"))
        .groupBy(col("z"))
        .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("y") === 1L, 0L).otherwise(1L)).as("n_neg"))
      val (cum, _) = PrefixSum.rankedRunningSum(
        byScore, Seq(col("z")), col("n_neg"), "__rn", "cum_neg")
      cum.agg(sum(col("n_pos")).as("np"), sum(col("n_neg")).as("nn"),
          sum(col("n_pos") * (lit(2L) * col("cum_neg") - col("n_neg")))
            .as("u2"))
        .select(lit(w.round).as("round"), col("np").as("n_pos"),
          col("nn").as("n_neg"), col("u2"),
          when(col("np") === 0L || col("nn") === 0L,
            lit(null).cast("long"))
            .otherwise(expr(
              "CAST(CAST(u2 AS DECIMAL(38,0)) * 10000" +
                " DIV (2 * np * nn) AS BIGINT)"))
            .as("auc_bp"))
    }.reduce(_ unionByName _)
  }

  /** Pooled holdout learning curve for a corpus dir: train on the
    * doc_id % HoldoutMod ≠ 0 split, score each round on the held-out
    * rows (q279's frame, and the input to the serving-round pick).
    * Rides the pool as a Rounds-row frame so the 4 scoring passes run
    * once per (sfDir, JVM). */
  def pooledHoldoutCurve(spark: SparkSession, sfDir: String): DataFrame =
    FramePool.frames(s"logit-holdout-curve:$sfDir") {
      val feat = pooledHoldoutFeatures(spark, sfDir)
      val train = feat.filter(pmod(col("doc_id"), lit(HoldoutMod)) =!= 0)
      val hold = feat.filter(pmod(col("doc_id"), lit(HoldoutMod)) === 0)
      Seq(holdoutAuc(hold, trainTrajectory(train)).coalesce(1))
    }.head

  /** The deployment rule q279 exists to drive: serve the round with
    * the highest holdout AUC, ties broken toward the LATER round
    * (more training at equal validation quality). Loud when the curve
    * is empty or no round has a defined AUC — serving an unvalidated
    * model is the silent failure this selection exists to prevent. */
  def selectServedRound(curve: Seq[(Long, Option[Long])]): Long = {
    val defined = curve.collect { case (r, Some(a)) => (a, r) }
    require(defined.nonEmpty,
      "Logit.selectServedRound: no training round has a defined holdout " +
        "AUC (single-class holdout?) — refusing to pick a served model")
    defined.max._2
  }

  /** The holdout-selected round for a corpus dir (one bounded collect
    * of the pooled Rounds-row curve). */
  def selectedRound(spark: SparkSession, sfDir: String): Long =
    selectServedRound(
      pooledHoldoutCurve(spark, sfDir).collect().toSeq
        .map(r => (r.getLong(0),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))))

  /** The SERVED weight vector: the full-corpus trajectory evaluated at
    * the holdout-selected round — q279's actuator. The validation pass
    * picks WHICH round generalizes; the served weights themselves come
    * from the all-data training run (standard train/validate/refit:
    * the holdout chose a hyperparameter, then the model refits on
    * everything). Oracle twin: LogitOracle.scored's ws CTE. */
  def servingWeights(spark: SparkSession, sfDir: String): Weights = {
    val traj = pooledTrajectory(spark, sfDir)
    val r = selectedRound(spark, sfDir)
    traj.find(_.round == r).getOrElse(
      throw new IllegalArgumentException(
        s"Logit.servingWeights: selected round $r not in trajectory " +
          s"1..${traj.length}"))
  }

  /** Docs scored by the SERVED model (the holdout-selected round):
    * (doc_id, y, n_chars, z) with z the fixed-point logit — the one
    * scored frame the whole evaluation trio consumes. Oracle twin:
    * LogitOracle.scored. */
  def scoredDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val w = servingWeights(spark, sfDir)
    pooledFeatures(spark, sfDir)
      .select(col("doc_id"), col("y"), col("n_chars"), zExpr(w).as("z"))
  }

  /** The complete serving-time model: served weights PLUS the training
    * corpus's centering means. Both are model state — a deployment
    * ships them together (the [[save]] artifact carries the weights;
    * the means ride the same training corpus). */
  final case class Model(w: Weights, m1: Long, m2: Long, m3: Long)

  /** The served model of a training-corpus dir, ready to score
    * ARBITRARY documents via [[scoreCorpus]]. */
  def servingModel(spark: SparkSession, sfDir: String): Model = {
    val m = trainedMeans(spark, sfDir)
    Model(servingWeights(spark, sfDir), m._1, m._2, m._3)
  }

  /** Score an arbitrary (id, text) frame through a trained [[Model]]:
    * recompute the three raw fixed-point features from `textCol`,
    * center with the TRAINED means, apply the served weights. Returns
    * the input plus a `z` column. Pure per-row map — no shuffle, no
    * collect; at 100 TB this is a projection fused into whatever scan
    * feeds it. Oracle twin: the `rfq`/`zq` CTE shape in the refinery
    * acceptance query. */
  def scoreCorpus(docs: DataFrame, model: Model,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val raw = docs
      .withColumn("__ntok", size(split(col(textCol), " ")).cast("long"))
      .withColumn("__nstop", size(filter(split(col(textCol), " "),
        x => x.isin("a", "the", "of", "to"))).cast("long"))
      .withColumn("__nch", length(col(textCol)).cast("long"))
    raw.withColumn("z", expr(
        s"(${model.w.w0}L * ${Grid}L" +
          s" + ${model.w.w1}L * (__ntok * $Grid DIV 100 - ${model.m1}L)" +
          s" + ${model.w.w2}L * (__nstop * $Grid DIV __ntok - ${model.m2}L)" +
          s" + ${model.w.w3}L * ((__nch - (__ntok - 1)) * $Grid" +
          s" DIV (__ntok * 10) - ${model.m3}L)) DIV $Grid"))
      .drop("__ntok", "__nstop", "__nch")
  }

  /** The max-F1 operating point of the served model on its training
    * corpus — the q141 sweep's actuator: the fixed-point z cutoff a
    * deployment gates at (keep = z ≥ threshold). Evaluated at every
    * DISTINCT-score boundary (a z-threshold gate can only cut between
    * score groups): for cutoff z, TP = positives scoring ≥ z and
    * n = rows scoring ≥ z, so F1 = 2·TP/(n + P). The comparison runs
    * on the 10¹² integer grid — f1_sc = (2·TP·10¹²) DIV (n + P),
    * assembled through DECIMAL(38,0) (oracle: HUGEINT) since 2·TP·10¹²
    * wraps a Long past TP ≈ 4.6·10⁶ — with ties broken toward the
    * LARGER z (the conservative gate). One |distinct z|-sized frame,
    * one distributed prefix sum, one 1-row reduction. */
  def maxF1Threshold(spark: SparkSession, sfDir: String): Long = {
    val scored = scoredDocs(spark, sfDir)
    val byScore = scored.groupBy(col("z"))
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n_all"))
    // cumulate in z DESC order: cum_tp/cum_n = counts at cutoff "≥ z"
    val (cum, _) = PrefixSum.rankedRunningSum(
      byScore, Seq(col("z").desc), col("n_pos"), "__rn", "cum_tp")
    val (cum2, _) = PrefixSum.rankedRunningSum(
      cum, Seq(col("z").desc), col("n_all"), "__rn2", "cum_n")
    val totalPos = scored.agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L))).head().getLong(0)
    val best = cum2
      .select(col("z"), expr(
        s"CAST(CAST(2 * cum_tp AS DECIMAL(38,0)) * 1000000000000" +
          s" DIV (cum_n + ${totalPos}L) AS BIGINT)").as("f1_sc"))
      .orderBy(col("f1_sc").desc, col("z").desc)
      .limit(1).head()
    best.getLong(0)
  }

  /** A [[load]]ed artifact: the full trajectory plus the round the
    * holdout selection marked for serving. */
  final case class Artifact(trajectory: Seq[Weights], servedRound: Long) {
    def served: Weights = trajectory.find(_.round == servedRound).get
  }

  /** Persist a trained trajectory as ONE round-ordered parquet frame —
    * the artifact half of the classifier lifecycle (the Bpe.save
    * pattern) — WITH the holdout-selected serving round stamped as a
    * `served` flag column. A quality filter is trained once and served
    * by every downstream keep/drop decision, usually in a different
    * session; the selection must travel WITH the weights or the
    * consumer re-derives it from faith (the q279-without-actuator gap
    * this column closes). */
  def save(spark: SparkSession, traj: Seq[Weights], servedRound: Long,
           dir: String): Unit = {
    require(traj.nonEmpty, "Logit.save: empty trajectory")
    require(traj.map(_.round) == (1L to traj.length.toLong),
      "Logit.save: rounds must be contiguous 1..T in training order")
    require(traj.exists(_.round == servedRound),
      s"Logit.save: served round $servedRound not in trajectory " +
        s"1..${traj.length}")
    import spark.implicits._
    traj.map(w => (w.round, w.w0, w.w1, w.w2, w.w3, w.round == servedRound))
      .toDF("round", "w0", "w1", "w2", "w3", "served")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d trajectory, re-validated LOUDLY: rounds must be
    * the contiguous 1..T training order and EXACTLY one round must
    * carry the served flag — a truncated, reordered, or
    * ambiguously-marked artifact is a DIFFERENT model, so it fails
    * here rather than mis-scoring every downstream keep/drop
    * decision. */
  def load(spark: SparkSession, dir: String): Artifact = {
    val rows = spark.read.parquet(dir)
      .select(col("round").cast("long"), col("w0").cast("long"),
        col("w1").cast("long"), col("w2").cast("long"),
        col("w3").cast("long"), col("served").cast("boolean"))
      .collect()
      .map(r => (Weights(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)), r.getBoolean(5)))
      .sortBy(_._1.round).toSeq
    val out = rows.map(_._1)
    require(out.map(_.round) == (1L to out.length.toLong),
      s"Logit.load: rounds not contiguous 1..${out.length} — corrupt or " +
        s"truncated artifact at $dir")
    val served = rows.filter(_._2).map(_._1.round)
    require(served.length == 1,
      s"Logit.load: artifact at $dir marks ${served.length} rounds as " +
        "served (want exactly 1) — ambiguous serving selection")
    Artifact(out, served.head)
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
