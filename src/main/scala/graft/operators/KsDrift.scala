package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov drift — the algebra behind q225,
  * factored out because the (source, value) COUNT frame is exactly what
  * makes the statistic streamable: per-batch count partials merge by
  * plain per-(source, value) addition, and the D assembly below reads
  * only the merged counts — so the streamed report equals the batch
  * query over all arrivals EXACTLY (everything up to the one final
  * double division is integer/decimal arithmetic), which is what
  * [[graft.streaming.EventStreams.ksMonitorSink]] rides.
  *
  * Scale shape: one corpus-sized keyed aggregation into the
  * (source, value) count frame; every frame after it is
  * |axis|·|sources|-sized (axis = distinct observed values — bounded by
  * the value domain, never the corpus). The sup over all reals is
  * attained at a step of either CDF, and every step is an observed
  * value, so evaluating |F_s − F_base| on the merged distinct-value
  * axis is exact, not a discretization. */
object KsDrift {

  /** The (source, x, c) count frame both the batch query and the
    * streaming monitor aggregate — one map-side-combined pass. */
  def counts(df: DataFrame, sourceCol: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(sourceCol).as("source"), col(valueCol).cast("long").as("x"))
      .groupBy(col("source"), col("x")).agg(count(lit(1)).as("c"))

  /** Merge previously-materialized count partials — plain per-key
    * addition (sums of counts ≡ the one-pass counts). */
  def mergeCounts(partials: DataFrame): DataFrame =
    partials.groupBy(col("source"), col("x")).agg(sum(col("c")).as("c"))

  /** The KS report from a count frame alone: for every source except
    * the baseline, D's numerator max|cum_s·n_base − cum_base·n_s| over
    * the merged distinct-value axis (DECIMAL cross products — long·long
    * would wrap silently at extreme corpus sizes; the final long cast
    * is loud under ANSI) and the one double division last. */
  def report(cnts: DataFrame, baselineSource: String): DataFrame = {
    val axis = cnts.select(col("x")).distinct()
    val srcs = cnts.select(col("source")).distinct()
    val dense = axis.crossJoin(broadcast(srcs))
      .join(cnts, Seq("source", "x"), "left")
      .na.fill(0L, Seq("c"))
    val wc = Window.partitionBy(col("source")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dense.withColumn("cum", sum(col("c")).over(wc))
    val tot = cnts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val base = cum.filter(col("source") === baselineSource)
      .select(col("x"), col("cum").as("cum0"))
    val nb = tot.filter(col("source") === baselineSource)
      .select(col("n").as("n_base"))
    cum.filter(col("source") =!= baselineSource)
      .join(base, Seq("x"))
      .join(broadcast(tot), Seq("source"))
      .crossJoin(broadcast(nb))
      .groupBy(col("source"), col("n_base"), col("n").as("n_src"))
      .agg(max(abs(col("cum").cast("decimal(38,0)") * col("n_base")
          - col("cum0").cast("decimal(38,0)") * col("n")))
        .cast("long").as("d_num"))
      .select(col("source"), col("n_base"), col("n_src"), col("d_num"),
        (col("d_num").cast("double")
          / (col("n_src") * col("n_base")).cast("double")).as("ks"))
      .orderBy("source")
  }
}
