package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Mergeable equi-width histogram sketch for quantile ESTIMATION — the
  * quantile sibling of the Count-Min frequency sketch ([[CountMin]]),
  * the KMV distinct sketch (q187) and the Bloom membership sketch
  * ([[BloomSet]]): values land in fixed-width bins of EXACT long
  * counters, and any quantile is answered from the bin frame alone by
  * a cumulative walk + within-bin linear interpolation — entirely in
  * integer fixed-point, so estimates are bit-identical in DuckDB (the
  * sketch is hash-checked, not statistically trusted, like the rest of
  * the family).
  *
  * Scale shape: the build is ONE keyed aggregation (map-side combined)
  * into a frame bounded by the VALUE RANGE over the bin width — never
  * by the corpus; partials over any partition of the stream merge by
  * per-bin addition, which is what the streaming monitor rides
  * ([[graft.streaming.EventStreams.histMonitorSink]]): per-batch bin
  * partials, summed at serve time, equal the one-pass sketch exactly.
  * The quantile walk runs over the SKETCH-sized bin frame (one small
  * single-partition window + a 7-row broadcast range join — both
  * declared in plan_golden), so serving cost is independent of corpus
  * size; only the one-row total crosses the driver. */
object HistSketch {

  /** Bin width in micro-units (10⁻⁶ of the value's unit) — 1.0 units
    * per bin, mirrored literally in every oracle. */
  val W = 1000000L

  /** Build the bin frame (bin, c) from a non-negative micro-unit long
    * column — exact long counters, ≤ (range / W) rows no matter the
    * corpus. Callers feed values through the deterministic
    * IEEE→DECIMAL(18,6)→×10⁶ cast (the dsum discipline) so the binning
    * is bit-identical in DuckDB. Values must be ≥ 0 (integer division
    * truncates toward zero — floor only on the non-negative axis). */
  def sketch(values: DataFrame, microCol: String): DataFrame =
    values.filter(col(microCol).isNotNull)
      // fail LOUDLY on negative input (the CorpusStats assert_true
      // idiom): DIV truncates toward zero, so a negative value would
      // silently collapse (−W, W) into the bin-0 region and skew every
      // quantile instead of erroring
      .filter(isnull(assert_true(col(microCol) >= 0,
        lit(s"HistSketch.sketch: negative $microCol — bins require " +
          "non-negative micro-units"))))
      .select(expr(s"$microCol DIV $W").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))

  /** DELETE maintenance by sketch LINEARITY — the bin counters are
    * plain per-bin sums, so subtracting the deleted values' own sketch
    * leaves EXACTLY the bin frame a fresh build over the remainder
    * would produce (drained bins dropped — a fresh build never
    * materializes untouched bins), the same property [[CountMin.delete]]
    * rides and Bloom/KMV provably lack. A |deleted|-sized adjustment:
    * the join touches ≤ range/W rows on both sides. q236 oracle-gates
    * quantiles served from the pruned sketch against a DuckDB fresh
    * build over the remainder — the rebuild equivalence IS the gate. */
  def delete(bins: DataFrame, deletedBins: DataFrame): DataFrame = {
    // both inputs persist for the call's lifetime: they are sketch-sized
    // (≤ range/W rows) but their LINEAGE is corpus-sized, and the eager
    // precondition below plus the result's downstream consumptions would
    // otherwise re-run the corpus aggregation each time (measured: q236
    // regressed 1.13 → 1.63 s when the eager check landed unpersisted)
    val binsP = OperatorCaches.persistTracked(bins)
    val dd = OperatorCaches.persistTracked(
      deletedBins.withColumnsRenamed(Map("c" -> "cd")))
    val msg = "HistSketch.delete: deleted count exceeds bin count — " +
      "deleting values never inserted breaks rebuild equivalence"
    // over-deletion form 1 — a bin the sketch never held — is checked
    // EAGERLY with a sketch-sized action (both frames are ≤ range/W
    // rows, the scaladoc's own bound). An in-plan formulation was
    // defeated by optimizer rewrites TWICE (observed, not
    // hypothetical): a full-join variant is converted back to a left
    // join by the trailing c > 0 filter, dropping the null-c rows
    // before their assert runs; and a union'd anti-join branch has its
    // assert projection collapsed into the upstream aggregate, where
    // the `cd IS NULL` condition is substituted with the provably
    // non-null count(1) and folds into an unconditional raise on rows
    // that were never orphans. A loud bounded precondition beats a
    // clever plan.
    if (!dd.join(binsP.select(col("bin")), Seq("bin"), "left_anti").isEmpty)
      throw new IllegalArgumentException(msg +
        " (a deleted bin is absent from the sketch)")
    binsP.join(dd, Seq("bin"), "left")
      // over-deletion form 2 — deleting MORE than an existing bin holds
      // (deleting twice) — stays in-plan: a silent clamp would drop the
      // bin as if cleanly drained and diverge from the delete-equals-
      // rebuild contract above without any signal
      .filter(isnull(assert_true(coalesce(col("cd"), lit(0L)) <= col("c"),
        lit(msg))))
      .select(col("bin"),
        (col("c") - coalesce(col("cd"), lit(0L))).as("c"))
      .filter(col("c") > 0L)
  }

  /** Quantile estimates from a bin frame alone: for each requested
    * percentile p (integer percent), target rank r = ⌈p·N/100⌉, the
    * first bin whose cumulative count reaches r, and the within-bin
    * linear interpolation bin·W + ⌊W·(r − cum_prev) / c⌋ — all exact
    * long arithmetic. Returns (p_pct, target_rank, est_fp) ordered by
    * p_pct; empty when the sketch is empty. N is read from the sketch
    * itself (one bounded driver-side row, the [[PrefixSum]]
    * convention). */
  def quantiles(bins: DataFrame, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must be integer percents in [1,100] (got $ps)")
    val spark = bins.sparkSession
    val n = bins.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ps.map(p => Row(p.toLong, (p.toLong * n + 99L) / 100L)), 1),
      StructType(Seq(StructField("p_pct", LongType, nullable = false),
        StructField("target_rank", LongType, nullable = false))))
    // the cumulative walk runs over the SKETCH-sized bin frame — a
    // single-partition window over ≤ range/W rows is scale-safe here
    // (same argument as the CMS/Bloom report frames)
    val cumb = bins.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val hit = broadcast(targets)
      .join(cumb, col("cum") >= col("target_rank"))
      .groupBy(col("p_pct"), col("target_rank"))
      .agg(min(col("bin")).as("bin"))
    hit.join(cumb, Seq("bin"))
      .select(col("p_pct"), col("target_rank"),
        (col("bin") * lit(W) +
          expr(s"($W * (target_rank - (cum - c))) DIV c")).as("est_fp"))
      .orderBy("p_pct")
  }
}
